from .parser import parse_query  # noqa: F401
from .exec import search  # noqa: F401

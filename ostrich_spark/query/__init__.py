from .parser import parse_query  # noqa: F401
from .exec import search  # noqa: F401
from .multi import search_multi  # noqa: F401

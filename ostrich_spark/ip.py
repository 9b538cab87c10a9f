"""IP address field support — the Elasticsearch ``ip`` type analog.

ES/Lucene store every ip value as a 16-byte IPv6 address
(InetAddressPoint): IPv4 embeds as the IPv4-mapped block
``::ffff:a.b.c.d``, and ranges / CIDR masks / sorting all compare those
bytes. We store the SAME 16 bytes as a 32-char lowercase hex STRING
docmap column: lexicographic order over fixed-width hex equals numeric
order over the 128-bit value, so the EXISTING keyword machinery —
string ranges with parquet min/max row-group pruning, exact equality,
IN sets, exists, sorted search, facets, and the percolator's string
interval join — runs every ip query verbatim. Only value ENCODING is
ip-specific, and it happens at the edges (build input, query parse,
percolation doc ingest); the cluster never sees an un-encoded ip.

Semantics inherited from the encoding, matching ES:

- an IPv4 CIDR mask (even ``0.0.0.0/0``) matches only IPv4 addresses
  (they live inside the mapped block); ``::/0`` matches everything;
- ``1.2.3.4`` and ``::ffff:1.2.3.4`` are the SAME value (one encoding);
- sort order is numeric, not dotted-string lexicographic
  (``9.0.0.0 < 10.0.0.0``).

Parsing uses the stdlib :mod:`ipaddress` module (driver-side for query
literals; Arrow-batched + unique-memoized for build/percolation
columns). The canonical form is unambiguous — no textual ip is 32 bare
hex chars (IPv6 needs colons, IPv4 dots) — so every entry point accepts
EITHER a raw ip literal or an already-canonical value (the reindex /
programmatic-query shape) without double-encoding risk.
"""

from __future__ import annotations

import ipaddress

import pandas as pd

# IPv4-mapped IPv6 block offset: ::ffff:0:0/96 (RFC 4291 §2.5.5.2)
_V4_OFFSET = 0xFFFF00000000
_HEX_CHARS = frozenset("0123456789abcdef")


def ip_hex(value: str) -> str:
    """Canonical 32-char lowercase hex of one ip literal (v4 or v6).

    Raises ValueError on anything :func:`ipaddress.ip_address` rejects.
    """
    addr = ipaddress.ip_address(str(value).strip())
    n = int(addr) + (_V4_OFFSET if addr.version == 4 else 0)
    return format(n, "032x")


def hex_to_ip(h: str) -> str:
    """Inverse of :func:`ip_hex` for display: a mapped-v4 value prints
    in dotted form, anything else in compressed IPv6 form."""
    n = int(h, 16)
    if n >> 32 == 0xFFFF:
        return str(ipaddress.IPv4Address(n & 0xFFFFFFFF))
    return str(ipaddress.IPv6Address(n))


def is_canonical(value) -> bool:
    """True when ``value`` is already a canonical 32-hex encoding."""
    return (
        isinstance(value, str)
        and len(value) == 32
        and all(c in _HEX_CHARS for c in value)
    )


def normalize_ip_value(value, field_name: str) -> str:
    """Raw ip literal OR canonical hex -> canonical hex (loud on junk)."""
    if is_canonical(value):
        return value
    try:
        return ip_hex(value)
    except ValueError:
        raise ValueError(
            f"ip field {field_name!r}: cannot parse {value!r} as an "
            f"IPv4/IPv6 address"
        ) from None


def cidr_bounds(cidr: str) -> tuple[str, str]:
    """INCLUSIVE canonical-hex ``[lo, hi]`` of a CIDR block.

    ``strict=False`` (host bits tolerated, the ES behavior); a v4 net
    maps into the v4-mapped block so it can never match a v6 value.
    """
    net = ipaddress.ip_network(str(cidr).strip(), strict=False)
    off = _V4_OFFSET if net.version == 4 else 0
    return (
        format(int(net.network_address) + off, "032x"),
        format(int(net.broadcast_address) + off, "032x"),
    )


def ip_range_spec(key: str, from_=None, to=None, mask: str | None = None):
    """One ES ``ip_range`` aggregation bucket -> the engine's
    ``(key, lo, hi)`` declared-range form (lo INCLUSIVE, hi EXCLUSIVE —
    the shared range-agg convention).

    Exactly like ES: either ``from``/``to`` ip literals (to exclusive,
    either side open) or a ``mask`` CIDR (inclusive network range,
    mutually exclusive with from/to). The exclusive ``hi`` of a mask is
    broadcast+1 — ``None`` (open) when the mask tops out the address
    space (``::/0``'s upper edge has no successor).
    """
    if mask is not None:
        if from_ is not None or to is not None:
            raise ValueError(
                f"ip_range bucket {key!r}: mask and from/to are mutually "
                f"exclusive (the ES ip_range contract)"
            )
        lo, hi = cidr_bounds(mask)
        n = int(hi, 16) + 1
        return (key, lo, None if n >> 128 else format(n, "032x"))
    lo = normalize_ip_value(from_, key) if from_ is not None else None
    hi = normalize_ip_value(to, key) if to is not None else None
    return (key, lo, hi)


def ip_hex_series(
    s: pd.Series, errors: str = "raise", field_name: str = ""
) -> pd.Series:
    """Vectorized canonical encode of a pandas string column.

    NULL / empty-after-strip values encode to None (no value — never
    matches any ip predicate, like every doc-value type). Canonical
    inputs pass through (the reindex shape: the stored docmap column IS
    the canonical form). ``errors="raise"`` (build: a malformed ip is a
    corrupt index, not a convenience) or ``"null"`` (percolation: a
    garbled stream doc matches nothing, never errors).

    Unique-memoized: :func:`ipaddress.ip_address` runs once per DISTINCT
    value per batch — log/flow data repeats ips heavily.
    """
    if errors not in ("raise", "null"):
        raise ValueError(f"errors must be 'raise' or 'null', got {errors!r}")
    raw = s.astype("string")
    memo: dict[str, str | None] = {}

    def enc(v):
        if v is pd.NA or v is None:
            return None
        v = v.strip()
        if not v:
            return None
        got = memo.get(v)
        if got is None and v not in memo:
            if is_canonical(v):
                got = v
            else:
                try:
                    got = ip_hex(v)
                except ValueError:
                    if errors == "raise":
                        raise ValueError(
                            f"ip field {field_name!r}: cannot parse {v!r} "
                            f"as an IPv4/IPv6 address"
                        ) from None
                    got = None
            memo[v] = got
        return got

    return raw.map(enc).astype(object).where(raw.notna(), None)


def ip_hex_udf():
    """Arrow-batched Spark column encoder (percolation's incoming-doc
    shape): raw ip strings -> canonical hex, garbled/NULL -> NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _enc(s: pd.Series) -> pd.Series:
        return ip_hex_series(s, errors="null")

    return _enc


def ip_hex_sql(col: str) -> str:
    """DuckDB SQL emitting the canonical hex of a DOTTED-IPV4 string
    column — the shared-generator convention (geohash/geo-polygon style):
    the oracle recomputes the encoding independently of Python
    ``ipaddress`` but lands on the identical 32 chars. IPv4 only (the
    oracle fixtures are v4; v6 correctness is pinned by pytest goldens
    against the stdlib reference)."""
    octet = "cast(split_part({c}, '.', {i}) as bigint)"
    n = " + ".join(
        f"{octet.format(c=col, i=i)} * {1 << (8 * (4 - i))}"
        if i < 4
        else octet.format(c=col, i=i)
        for i in (1, 2, 3, 4)
    )
    return f"'00000000000000000000ffff' || lpad(lower(to_hex({n})), 8, '0')"

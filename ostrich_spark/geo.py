"""Geo-point query & aggregation surface (EXTENSION — the reference has
text fields only; this is the Elasticsearch ``geo_point`` feature set
re-expressed Spark-first).

A geo field (``Schema.add_geo_field``) stores two float64 docmap columns
``{name}__lat`` / ``{name}__lon`` (schema.geo_lat_col / geo_lon_col).
Everything here is pure Catalyst column expressions over those columns —
whole-stage codegen, zero Python in the scan:

- ``haversine_m``       great-circle distance column (IUGG sphere)
- ``geo_distance_search`` all live docs within a radius (+ distance)
- ``geo_sort``          nearest-k by distance (TakeOrderedAndProject)
- ``geo_bounding_box_search`` inclusive box scan (dateline-wrap aware)
- ``geotile_grid``      web-mercator z/x/y tile buckets (ES geotile_grid)
- ``geohash_grid``      base32 geohash-cell buckets (ES geohash_grid)

Query-tree composition (a geo filter next to scored text) goes through
the AST nodes instead: ``parser.GeoDistanceQuery`` /
``parser.GeoBoundingBoxQuery`` ride the CRange aux-set delivery
(plan.CGeoDistance / CGeoBBox, exec.range_match_df) — one docmap scan
per clause, cogrouped into the scoring shuffle, never collected.

Scale notes. Every function here is one docmap scan + (for the grids)
one partial-aggregated groupBy on the cell key — no joins, no windows,
no driver collection. Bounding boxes push plain float comparisons to
parquet (min/max row-group stats prune); distance/grid expressions keep
the scan but stay JVM-side. Grid cardinality is bounded by the zoom /
precision (4^z tiles, 32^p geohash cells), so the groupBy reduces
map-side like any low-cardinality rollup.

Geohash cell identity is PURE ARITHMETIC (floor of linear transforms +
bit interleave + alphabet lookup) — no libm — so engine and oracle
(DuckDB SQL generated from the same loop, see geohash_sql) agree
bit-for-bit. Geotile's y axis needs ln/tan (web-mercator); cell ids are
exact except for points within ~1 ulp of a tile boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .manifest import Manifest, load_manifest
from .schema import geo_lat_col, geo_lon_col

# IUGG mean earth radius, meters — the constant Lucene's
# SloppyMath.haversinMeters is calibrated to (TO_METERS = 6371008.7714).
# Engine and every oracle must share this exact literal.
EARTH_RADIUS_M = 6371008.8

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_m(lat_col, lon_col, lat: float, lon: float) -> Column:
    """Great-circle meters between (lat_col, lon_col) and a fixed origin.

    2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))) — evaluated as
    Catalyst trig columns (JVM libm, whole-stage codegen). The origin's
    trig is folded driver-side with Python's libm so a gated oracle can
    reuse the identical folded constants.
    """
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon_c = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    phi1 = math.radians(lat)
    cos_phi1 = math.cos(phi1)
    dphi_half = (F.radians(lat_c) - F.lit(phi1)) / F.lit(2.0)
    dlam_half = (F.radians(lon_c) - F.lit(math.radians(lon))) / F.lit(2.0)
    a = (
        F.sin(dphi_half) * F.sin(dphi_half)
        + F.lit(cos_phi1) * F.cos(F.radians(lat_c)) * F.sin(dlam_half) * F.sin(dlam_half)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_sql(lat_expr: str, lon_expr: str, lat: float, lon: float) -> str:
    """DuckDB SQL for the SAME haversine as haversine_m: identical
    formula shape, identical driver-folded origin constants (phi1,
    cos_phi1 from Python libm are embedded as literals both sides), so
    the only per-row libm calls — sin/cos/asin/sqrt on IEEE doubles —
    are the sole divergence surface (≤1 ulp each)."""
    phi1 = math.radians(lat)
    cos_phi1 = math.cos(phi1)
    lam1 = math.radians(lon)
    return (
        f"(2.0 * {EARTH_RADIUS_M!r}) * asin(sqrt("
        f"pow(sin((radians({lat_expr}) - ({phi1!r})) / 2.0), 2) + "
        f"({cos_phi1!r}) * cos(radians({lat_expr})) * "
        f"pow(sin((radians({lon_expr}) - ({lam1!r})) / 2.0), 2)))"
    )


def _live_points(
    spark, index_dir: str, field: str, manifest: Manifest | None
) -> tuple[DataFrame, Manifest, str, str]:
    """Docmap rows that HAVE a point, tombstones excluded — the shared
    scan every geo surface starts from."""
    from .deletes import has_tombstones, read_tombstones
    from .query.exec import read_docmap

    manifest = manifest or load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not fe.is_geo:
        raise ValueError(
            f"{field!r} is not a geo field "
            f"(Schema.add_geo_field; got {'absent' if fe is None else fe.field_type!r})"
        )
    lat_c, lon_c = geo_lat_col(field), geo_lon_col(field)
    docmap = read_docmap(spark, index_dir, manifest)
    if lat_c not in docmap.columns:
        # evolved field with no committed data: no doc has a point
        docmap = docmap.withColumn(lat_c, F.lit(None).cast("double")).withColumn(
            lon_c, F.lit(None).cast("double")
        )
    df = docmap.filter(F.col(lat_c).isNotNull())
    if has_tombstones(index_dir, manifest):
        tomb = read_tombstones(spark, index_dir, manifest)
        df = df.join(tomb, ["segment_id", "doc"], "left_anti")
    return df, manifest, lat_c, lon_c


def haversine_m_cols(lat1_c, lon1_c, lat2_c, lon2_c) -> Column:
    """Haversine where BOTH endpoints are columns — the percolation-join
    shape (subscription origins ride the broadcast side as columns, so
    nothing folds driver-side). Same IUGG sphere as :func:`haversine_m`."""
    p1 = F.radians(lat1_c)
    p2 = F.radians(lat2_c)
    dphi = (p2 - p1) / F.lit(2.0)
    dlam = (F.radians(lon2_c) - F.radians(lon1_c)) / F.lit(2.0)
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_distance_search(
    spark,
    index_dir: str,
    field: str,
    lat: float,
    lon: float,
    radius_m: float,
    manifest: Manifest | None = None,
) -> DataFrame:
    """All live docs within ``radius_m`` of the origin, with a
    ``distance_m`` column. One docmap scan; the haversine is Catalyst
    columns. Returns (segment_id, doc, identity columns..., distance_m).
    """
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    dist = haversine_m(lat_c, lon_c, lat, lon)
    return df.withColumn("distance_m", dist).filter(
        F.col("distance_m") <= F.lit(float(radius_m))
    )


def geo_sort(
    spark,
    index_dir: str,
    field: str,
    lat: float,
    lon: float,
    k: int,
    tiebreak: str | None = None,
    manifest: Manifest | None = None,
) -> DataFrame:
    """Nearest-``k`` live docs by great-circle distance (the ES
    ``sort: _geo_distance`` analog). ``orderBy(distance).limit(k)``
    compiles to TakeOrderedAndProject — per-partition heaps + one
    driver-side k-merge, never a full sort. ``tiebreak`` names an
    identity column for a deterministic total order on exact ties
    (duplicate points tie exactly; default tiebreak is
    (segment_id, doc))."""
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    dist = haversine_m(lat_c, lon_c, lat, lon)
    out = df.withColumn("distance_m", dist)
    order = [F.col("distance_m").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    else:
        order.extend([F.col("segment_id").asc(), F.col("doc").asc()])
    return out.orderBy(*order).limit(int(k))


def geo_bounding_box_search(
    spark,
    index_dir: str,
    field: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
    manifest: Manifest | None = None,
) -> DataFrame:
    """Live docs inside the inclusive box. ``left > right`` wraps the
    antimeridian (ES semantics): lon >= left OR lon <= right. Pure
    comparisons — parquet min/max stats prune row groups."""
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    return df.filter(bbox_pred(lat_c, lon_c, top, left, bottom, right))


def bbox_pred(
    lat_col, lon_col, top: float, left: float, bottom: float, right: float
) -> Column:
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon_c = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat_ok = (lat_c >= F.lit(float(bottom))) & (lat_c <= F.lit(float(top)))
    if left <= right:
        lon_ok = (lon_c >= F.lit(float(left))) & (lon_c <= F.lit(float(right)))
    else:  # dateline wrap
        lon_ok = (lon_c >= F.lit(float(left))) | (lon_c <= F.lit(float(right)))
    return lat_ok & lon_ok


def _validate_polygon(points) -> list[tuple[float, float]]:
    pts = [(float(a), float(b)) for a, b in points]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]  # accept the GeoJSON closed form
    if len(pts) < 3:
        raise ValueError(
            f"geo_polygon needs >= 3 distinct vertices, got {len(pts)}"
        )
    for la, lo in pts:
        if not (-90.0 <= la <= 90.0) or not (-180.0 <= lo <= 180.0):
            raise ValueError(
                f"geo_polygon vertex ({la}, {lo}) out of range "
                "(lat in [-90,90], lon in [-180,180])"
            )
    lons = [lo for _, lo in pts]
    if max(lons) - min(lons) > 180.0:
        raise ValueError(
            "geo_polygon spanning more than 180 degrees of longitude is "
            "ambiguous in planar coordinates (dateline crossing is not "
            "supported — split the polygon, the classic Lucene guidance)"
        )
    return pts


def _polygon_edges(points):
    """(xi, yi, xj, yj) per edge with x = lon, y = lat; horizontal edges
    (yi == yj) dropped — they can never satisfy the crossing guard."""
    pts = _validate_polygon(points)
    out = []
    for i in range(len(pts)):
        yi, xi = pts[i]
        yj, xj = pts[(i + 1) % len(pts)]
        if yi != yj:
            out.append((xi, yi, xj, yj))
    if not out:
        raise ValueError("geo_polygon is degenerate (all vertices on one "
                         "latitude)")
    return out


def polygon_pred(lat_col, lon_col, points) -> Column:
    """Point-in-polygon as pure Catalyst columns — the ES ``geo_polygon``
    query / Lucene ``Polygon.contains`` PLANAR model: even-odd ray
    casting in (lon, lat) coordinates, one crossing test per edge,
    DIVISION-FREE (the slope comparison multiplies through by the
    edge's constant Δlat, whose sign picks the comparison direction at
    plan time — ANSI-safe, whole-stage codegen, no libm). ``points``
    are (lat, lon) vertices in ring order, convex or CONCAVE (the shape
    a bounding box cannot express); the GeoJSON closed form (last ==
    first) is accepted. Dateline-crossing polygons are rejected (planar
    coordinates make them ambiguous — split them, the Lucene guidance).
    Boundary behavior is the standard strict even-odd rule; NULL points
    produce NULL -> a filter drops them (no point never matches)."""
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon_c = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    crossings = None
    for xi, yi, xj, yj in _polygon_edges(points):
        straddles = (F.lit(yi) > lat_c) != (F.lit(yj) > lat_c)
        c = yj - yi  # constant, nonzero, sign known at plan time
        lhs = (lon_c - F.lit(xi)) * F.lit(c)
        rhs = F.lit(xj - xi) * (lat_c - F.lit(yi))
        cross = straddles & ((lhs < rhs) if c > 0 else (lhs > rhs))
        term = F.when(cross, F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    return crossings % 2 == 1


def polygon_pred_sql(lat_expr: str, lon_expr: str, points) -> str:
    """The DuckDB twin of :func:`polygon_pred` — emitted from the SAME
    edge list and the same division-free arithmetic, so both sides agree
    bit-for-bit even on boundary-adjacent points (the geohash
    shared-generator convention)."""
    terms = []
    for xi, yi, xj, yj in _polygon_edges(points):
        c = yj - yi
        op = "<" if c > 0 else ">"
        terms.append(
            f"(CASE WHEN (({yi!r} > {lat_expr}) <> ({yj!r} > {lat_expr})) "
            f"AND ((({lon_expr} - {xi!r}) * {c!r}) {op} "
            f"({(xj - xi)!r} * ({lat_expr} - {yi!r}))) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def geo_polygon_search(
    spark,
    index_dir: str,
    field: str,
    points,
    manifest: Manifest | None = None,
) -> DataFrame:
    """Live docs whose point lies inside the polygon (ES ``geo_polygon``
    query analog). One docmap scan; the ray cast is Catalyst columns."""
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    return df.filter(polygon_pred(lat_c, lon_c, points))


# --- grid aggregations ------------------------------------------------------


def geotile_xy(lat_col, lon_col, zoom: int) -> tuple[Column, Column]:
    """Web-mercator tile (x, y) at ``zoom`` — the ES geotile_grid key
    parts. x is linear in lon; y is the mercator projection
    (ln·tan — the one libm surface in the geo grids)."""
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon_c = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    n = float(1 << zoom)
    x = F.floor((lon_c + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    lat_rad = F.radians(lat_c)
    merc = F.log(F.tan(lat_rad) + (F.lit(1.0) / F.cos(lat_rad)))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    # ES clamps poleward points into the edge tiles
    x = F.greatest(F.lit(0), F.least(x, F.lit(int(n) - 1)))
    y = F.greatest(F.lit(0), F.least(y, F.lit(int(n) - 1)))
    return x.cast("long"), y.cast("long")


def geotile_grid(
    spark,
    index_dir: str,
    field: str,
    zoom: int,
    manifest: Manifest | None = None,
) -> DataFrame:
    """ES geotile_grid: doc counts per web-mercator tile. One scan + one
    partial-aggregated groupBy on (x, y) — cardinality ≤ 4^zoom.
    Columns: tile_x, tile_y, doc_count."""
    if not (0 <= zoom <= 29):
        raise ValueError("geotile zoom must be in [0, 29]")
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    x, y = geotile_xy(lat_c, lon_c, zoom)
    return (
        df.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def _geohash_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a precision-p geohash: 5p interleaved
    bits starting with longitude, so lon gets ceil(5p/2), lat floor."""
    total = 5 * precision
    return (total + 1) // 2, total // 2


def geohash_col(lat_col, lon_col, precision: int) -> Column:
    """Base32 geohash of (lat, lon) at ``precision`` — PURE ARITHMETIC
    Catalyst columns. The classic bit-interleave is computed without a
    loop over bits: lon_idx = floor((lon+180)/360·2^nlon) and lat_idx
    likewise give ALL the per-axis bits at once (uniform binary
    subdivision ≡ fixed-point truncation — same floor), then each base32
    character's 5 bits are extracted with shift/mask arithmetic.
    No libm anywhere, so a DuckDB oracle built by geohash_sql from the
    same generator agrees bit-for-bit."""
    if not (1 <= precision <= 12):
        raise ValueError("geohash precision must be in [1, 12]")
    lat_c = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon_c = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    nlon, nlat = _geohash_bits(precision)
    # 2^k scaling: exact powers of two, no rounding on the multiply-by-
    # power itself; clamp the right edge (lon=180 → last cell, ES-style)
    lon_idx = F.least(
        F.floor((lon_c + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))),
        F.lit((1 << nlon) - 1),
    ).cast("long")
    lat_idx = F.least(
        F.floor((lat_c + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))),
        F.lit((1 << nlat) - 1),
    ).cast("long")
    chars = []
    for ci in range(precision):
        # global bit positions (0 = first/most-significant geohash bit);
        # even global bits come from lon, odd from lat
        code = F.lit(0).cast("long")
        for bi in range(5):
            g = ci * 5 + bi
            if g % 2 == 0:
                src, nbits, k = lon_idx, nlon, g // 2
            else:
                src, nbits, k = lat_idx, nlat, g // 2
            # k-th most-significant of the axis's nbits: shift right by
            # (nbits-1-k), mask 1
            shift = nbits - 1 - k
            bit = (src / F.lit(float(1 << shift))).cast("long") % F.lit(2)
            code = code * F.lit(2) + bit
        chars.append(F.lit(GEOHASH_ALPHABET).substr(code.cast("int") + F.lit(1), F.lit(1)))
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """DuckDB SQL string computing the IDENTICAL geohash as geohash_col
    — generated from the same bit layout so engine and oracle share
    every operation (floor, power-of-two scale, shift/mask, alphabet
    substr). Used by the gated oracle; also handy for spot checks."""
    nlon, nlat = _geohash_bits(precision)
    lon_idx = (
        f"least(CAST(floor(({lon_expr} + 180.0) / 360.0 * {float(1 << nlon)!r}) AS BIGINT), "
        f"{(1 << nlon) - 1})"
    )
    lat_idx = (
        f"least(CAST(floor(({lat_expr} + 90.0) / 180.0 * {float(1 << nlat)!r}) AS BIGINT), "
        f"{(1 << nlat) - 1})"
    )
    parts = []
    for ci in range(precision):
        code = "0"
        for bi in range(5):
            g = ci * 5 + bi
            if g % 2 == 0:
                src, nbits, k = "LON_IDX", nlon, g // 2
            else:
                src, nbits, k = "LAT_IDX", nlat, g // 2
            shift = nbits - 1 - k
            bit = f"(CAST(floor({src} / {float(1 << shift)!r}) AS BIGINT) % 2)"
            code = f"({code} * 2 + {bit})"
        parts.append(f"substr('{GEOHASH_ALPHABET}', CAST({code} AS INT) + 1, 1)")
    expr = " || ".join(parts)
    return expr.replace("LON_IDX", lon_idx).replace("LAT_IDX", lat_idx)


def geohash_py(lat: float, lon: float, precision: int) -> str:
    """Pure-Python reference geohash (the textbook interval-halving
    algorithm, independent of the fixed-point formulation above) — the
    property tests' second opinion."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        code = 0
        for b in bits[i * 5 : i * 5 + 5]:
            code = code * 2 + b
        out.append(GEOHASH_ALPHABET[code])
    return "".join(out)


def _query_points(spark, index_dir, field, query, manifest, scorer):
    """_live_points, optionally narrowed to a query's match set (ES aggs
    run in query context; query=None keeps the every-live-point grid
    behavior). The match set joins co-keyed — never collected."""
    df, manifest, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    if query is not None:
        from .query.exec import search

        res, _ = search(
            spark, index_dir, query, limit=None, scorer=scorer,
            manifest=manifest,
        )
        df = df.join(
            res.select("segment_id", "doc"), ["segment_id", "doc"], "inner"
        )
    return df, lat_c, lon_c


def geo_centroid(
    spark,
    index_dir: str,
    field: str,
    query=None,
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
) -> DataFrame:
    """ES ``geo_centroid``: the arithmetic mean of the matched points'
    coordinates — one row (``lat``, ``lon``, ``count``). The ES
    definition is a plain per-axis mean (NOT a spherical centroid), so a
    point set straddling the ±180 meridian averages through the far side
    of the globe exactly like ES does (documented sharp edge of the agg
    itself). Docs without a point are excluded; zero points -> one row
    of NULLs with count 0. One partial-aggregated pass."""
    df, lat_c, lon_c = _query_points(
        spark, index_dir, field, query, manifest, scorer
    )
    return df.agg(
        F.avg(lat_c).alias("lat"),
        F.avg(lon_c).alias("lon"),
        F.count(F.lit(1)).alias("count"),
    )


def geo_bounds(
    spark,
    index_dir: str,
    field: str,
    query=None,
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
) -> DataFrame:
    """ES ``geo_bounds``: the smallest lat/lon-aligned box containing
    every matched point — one row (``top``, ``left``, ``bottom``,
    ``right``, ``count``) = (max lat, min lon, min lat, max lon). This
    is the ES ``wrap_longitude=false`` behavior — the box never wraps
    the ±180 meridian (the wrapping variant needs a circular-gap scan;
    the fixed box is what map UIs consume). One partial-aggregated
    pass; zero points -> NULL bounds with count 0."""
    df, lat_c, lon_c = _query_points(
        spark, index_dir, field, query, manifest, scorer
    )
    return df.agg(
        F.max(lat_c).alias("top"),
        F.min(lon_c).alias("left"),
        F.min(lat_c).alias("bottom"),
        F.max(lon_c).alias("right"),
        F.count(F.lit(1)).alias("count"),
    )


def geo_line(
    spark,
    index_dir: str,
    field: str,
    sort_by: str,
    query=None,
    by: list[str] | str | None = None,
    size: int = 10_000,
    order: str = "asc",
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
) -> DataFrame:
    """ES ``geo_line`` aggregation analog: the matched docs' points as
    an ordered TRACK — "each vessel's route, its pings sorted by
    timestamp". ``sort_by`` is a doc-value column giving the order
    along the line (the ES sort field, usually a date); ``order``
    asc/desc; ``by`` buckets one line per key (the terms-agg nesting ES
    ships for multiple tracks; None = one global line); ``size`` caps
    points per line (ES default 10000 — when a track exceeds it the
    FIRST ``size`` points in sort order are kept, the ES truncation).

    Docs missing the point OR the sort value contribute nothing (the ES
    behavior — both are required per doc).

    Returns flat rows (by..., seq, ``sort_by``, lat, lon) with ``seq``
    1-based along the line — numeric columns, not a serialized
    geometry, so the result joins/exports/oracle-checks like any frame
    (``collect_list`` over seq rebuilds a LineString trivially).

    Scale posture: rides top_hits' skew-safe two-phase plan — map-side
    Arrow pre-prune bounds each bucket's window input to
    O(size × batches); a million-ping hot vessel never funnels its raw
    match set through one task."""
    from .query.exec import top_hits
    from .query.parser import AllQuery

    if order not in ("asc", "desc"):
        raise ValueError(f"order must be asc/desc, got {order!r}")
    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or fe.field_type != "geo_point":
        raise ValueError(f"{field!r} is not a geo_point field")
    lat_c, lon_c = geo_lat_col(field), geo_lon_col(field)
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    out = top_hits(
        spark,
        index_dir,
        AllQuery() if query is None else query,
        by=by,
        size=size,
        sort=[(sort_by, order)],
        columns=[lat_c, lon_c],
        where=F.col(lat_c).isNotNull() & F.col(sort_by).isNotNull(),
        manifest=manifest,
        scorer=scorer,
    )
    return out.select(
        *by,
        F.col("rank").alias("seq"),
        sort_by,
        F.col(lat_c).alias("lat"),
        F.col(lon_c).alias("lon"),
    )


def geo_distance_agg(
    spark,
    index_dir: str,
    field: str,
    lat: float,
    lon: float,
    ranges: list[tuple],
    query=None,
    metrics: dict | None = None,
    manifest: Manifest | None = None,
    scorer: str = "tfidf",
) -> DataFrame:
    """ES ``geo_distance`` aggregation: distance-ring buckets around an
    origin. ``ranges`` is a list of ``(key, lo_m, hi_m)`` in METERS —
    lo inclusive, hi exclusive, either side None = unbounded, overlaps
    double-count, every DECLARED ring appears (empty ones with
    n_docs=0/NULL metrics) — exactly the ``range_agg`` contract over a
    COMPUTED great-circle distance instead of a stored doc value.
    Distance is the haversine on the IUGG sphere (R=6371008.8, the ES
    ``arc`` distance_type) evaluated as Catalyst columns inside the
    tagging projection — JVM whole-stage codegen, computed once per row
    however many rings it lands in. Docs without a point fall in no
    ring; ``metrics`` follows the shared facet metric grammar over
    docmap columns. Output (range_key, lo, hi, n_docs, *metrics) in
    declaration order. One docmap scan (query match set co-keyed in) +
    one partial-aggregated groupBy — no per-ring job."""
    from .query.exec import bucket_by_declared_ranges

    if not ranges:
        raise ValueError("ranges must declare >= 1 (key, lo_m, hi_m) ring")
    keys = [r[0] for r in ranges]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate range keys: {keys}")
    for key, lo, hi in ranges:
        if (lo is not None and lo < 0) or (hi is not None and hi < 0):
            raise ValueError(f"ring {key!r}: distances must be >= 0 meters")
    df, lat_c, lon_c = _query_points(
        spark, index_dir, field, query, manifest, scorer
    )
    dist = haversine_m(lat_c, lon_c, float(lat), float(lon))
    return bucket_by_declared_ranges(spark, df, dist, ranges, metrics or {})


def geohash_grid(
    spark,
    index_dir: str,
    field: str,
    precision: int,
    manifest: Manifest | None = None,
) -> DataFrame:
    """ES geohash_grid: doc counts per base32 geohash cell. One scan +
    one partial-aggregated groupBy on the hash — cardinality ≤ 32^p.
    Columns: geohash, doc_count."""
    df, _, lat_c, lon_c = _live_points(spark, index_dir, field, manifest)
    return (
        df.withColumn("geohash", geohash_col(lat_c, lon_c, precision))
        .groupBy("geohash")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


# --- geo_shape: polygon documents (filter-then-verify) ----------------------
# Lucene's LatLonShape tessellates polygons into BKD triangles; the
# Spark-native equivalent of the same strategy stores each doc's ring
# bbox in four plain float columns (parquet min/max stats prune the
# candidate scan — the BKD-filter analog) and runs the EXACT test only
# over pruned candidates, numpy-vectorized across a whole Arrow batch
# of ragged rings (flatten + reduceat; zero per-vertex Python). The
# point-in-ring math is the SAME division-free even-odd crossing test
# polygon_pred compiles to Catalyst columns — one algorithm, two
# execution substrates. Boundary behavior is the module's strict
# even-odd convention throughout: a query geometry merely TOUCHING a
# ring's boundary does not intersect it (documented; the gated entries
# and tests keep geometries clear of boundary coincidence).


def parse_ring(text: str):
    """``"lat,lon;lat,lon;..."`` -> validated [(lat, lon), ...] ring
    (>= 3 distinct vertices after dropping the GeoJSON closing repeat,
    coordinates range-checked, dateline-spanning rejected)."""
    pts = []
    for part in str(text).split(";"):
        part = part.strip()
        if not part:
            continue
        lat_s, sep, lon_s = part.partition(",")
        if not sep:
            raise ValueError(
                f"geo_shape ring vertex {part!r} is not 'lat,lon'"
            )
        pts.append((float(lat_s), float(lon_s)))
    pts = _validate_polygon(pts)
    if len({p[0] for p in pts}) == 1:
        raise ValueError(
            "geo_shape ring is degenerate (all vertices on one latitude)"
        )
    return pts


def _flat_rings(lats_rows, lons_rows):
    """Flatten a batch of ragged rings into edge-index arrays.

    Returns (y, x, idx, nxt, starts, sizes, valid) where y/x are the
    concatenated vertex lat/lon arrays, (idx, nxt) index each edge's
    endpoints (nxt wraps to the ring's first vertex), starts/sizes
    address each VALID row's vertex span, and valid marks rows that
    carry a ring. Rows without a shape contribute nothing.
    """
    import numpy as np

    n = len(lats_rows)
    valid = np.zeros(n, dtype=bool)
    chunks_y, chunks_x, sizes = [], [], []
    for i in range(n):  # per-ROW boxing (Arrow list rows), not per-vertex
        a = lats_rows[i]
        if a is None or (hasattr(a, "__len__") and len(a) == 0):
            continue
        b = lons_rows[i]
        valid[i] = True
        chunks_y.append(np.asarray(a, dtype=np.float64))
        chunks_x.append(np.asarray(b, dtype=np.float64))
        sizes.append(len(a))
    if not sizes:
        return None
    y = np.concatenate(chunks_y)
    x = np.concatenate(chunks_x)
    sizes = np.asarray(sizes, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    idx = np.arange(len(y), dtype=np.int64)
    nxt = idx + 1
    nxt[starts + sizes - 1] = starts  # wrap each ring's last edge
    return y, x, idx, nxt, starts, sizes, valid


def _counts_to_rows(per_ring, valid):
    import numpy as np

    out = np.zeros(len(valid), dtype=bool)
    out[valid] = per_ring
    return out


def rings_contain_point(lats_rows, lons_rows, qlat: float, qlon: float):
    """Per-row strict even-odd point-in-ring over a ragged batch —
    the numpy mirror of :func:`polygon_pred`'s Catalyst columns."""
    import numpy as np

    flat = _flat_rings(lats_rows, lons_rows)
    if flat is None:
        return np.zeros(len(lats_rows), dtype=bool)
    y, x, idx, nxt, starts, sizes, valid = flat
    yi, yj = y[idx], y[nxt]
    straddles = (yi > qlat) != (yj > qlat)
    c = yj - yi
    lhs = (qlon - x[idx]) * c
    rhs = (x[nxt] - x[idx]) * (qlat - yi)
    cross = straddles & np.where(c > 0, lhs < rhs, lhs > rhs)
    n_cross = np.add.reduceat(cross, starts)
    return _counts_to_rows(n_cross % 2 == 1, valid)


def _orient(ax, ay, bx, by, cx, cy):
    """Sign of the cross product (b-a) x (c-a) — vectorized orientation."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def rings_intersect_bbox(lats_rows, lons_rows, top, left, bottom, right):
    """Per-row strict interior-overlap test of each ring against an
    axis-aligned box: any ring vertex strictly inside the box, OR any
    box corner strictly inside the ring, OR any ring edge PROPERLY
    crossing any box side. All three branches vectorize over the
    flattened batch (reduceat per ring)."""
    import numpy as np

    flat = _flat_rings(lats_rows, lons_rows)
    if flat is None:
        return np.zeros(len(lats_rows), dtype=bool)
    y, x, idx, nxt, starts, sizes, valid = flat

    # (a) any vertex strictly inside the box
    v_in = (y > bottom) & (y < top) & (x > left) & (x < right)
    any_v = np.add.reduceat(v_in, starts) > 0

    # (b) any box corner strictly inside the ring (4 even-odd casts)
    corner_in = np.zeros(int(len(starts)), dtype=bool)
    for clat, clon in ((top, left), (top, right), (bottom, left),
                       (bottom, right)):
        yi, yj = y[idx], y[nxt]
        straddles = (yi > clat) != (yj > clat)
        c = yj - yi
        lhs = (clon - x[idx]) * c
        rhs = (x[nxt] - x[idx]) * (clat - yi)
        cross = straddles & np.where(c > 0, lhs < rhs, lhs > rhs)
        corner_in |= np.add.reduceat(cross, starts) % 2 == 1

    # (c) any ring edge properly crossing any of the 4 box sides
    # (strict: orientations on opposite sides for BOTH segments)
    e_cross = np.zeros(len(idx), dtype=bool)
    ax, ay, bx, by = x[idx], y[idx], x[nxt], y[nxt]
    sides = (
        (left, top, right, top), (left, bottom, right, bottom),
        (left, bottom, left, top), (right, bottom, right, top),
    )
    for px, py, qx, qy in sides:
        d1 = _orient(ax, ay, bx, by, px, py)
        d2 = _orient(ax, ay, bx, by, qx, qy)
        d3 = _orient(px, py, qx, qy, ax, ay)
        d4 = _orient(px, py, qx, qy, bx, by)
        e_cross |= (d1 * d2 < 0) & (d3 * d4 < 0)
    any_e = np.add.reduceat(e_cross, starts) > 0

    return _counts_to_rows(any_v | corner_in | any_e, valid)


def _shape_verify_udf(kind: str, *params):
    """Arrow-batched boolean predicate over the ring array columns —
    the exact-verify stage running only on bbox-pruned candidates."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # plain-function form (no type hints): geo.py's future-annotations
    # import stringifies hints, which the hint-inferring decorator path
    # cannot evaluate — the explicit returnType form pins SCALAR eval
    if kind == "point":
        qlat, qlon = params

        def _verify(lats, lons):
            return pd.Series(
                rings_contain_point(lats.tolist(), lons.tolist(),
                                    qlat, qlon))
    else:
        top, left, bottom, right = params

        def _verify(lats, lons):
            return pd.Series(
                rings_intersect_bbox(lats.tolist(), lons.tolist(),
                                     top, left, bottom, right))

    return pandas_udf(_verify, "boolean")


def shape_search(
    spark,
    index_dir: str,
    field: str,
    relation: str,
    geometry: tuple,
    manifest: Manifest | None = None,
):
    """Standalone geo_shape query (the ES ``geo_shape`` query analog,
    filter context): docs whose stored ring satisfies ``relation``
    against ``geometry`` — ``("point", lat, lon)`` with relation
    ``intersects`` (ring contains the point), or ``("bbox", top, left,
    bottom, right)`` with ``intersects`` / ``within`` / ``disjoint``.
    Tombstones excluded. Returns live (segment_id, doc, *id/docmap
    columns) rows of matching docs.

    Plan shape: the four bbox columns decide ``within`` outright and
    PRUNE ``intersects``/``disjoint``/point candidates via parquet
    min/max stats before the Arrow verify reads a single ring array.
    """
    from .query.parser import GeoShapeQuery

    if manifest is None:
        manifest = load_manifest(index_dir)
    fe = manifest.schema.field_by_name(field)
    if fe is None or not fe.is_shape:
        raise ValueError(
            f"{field!r} is not a geo_shape field of this index"
        )
    q = GeoShapeQuery(fe.id, relation, geometry)  # validates
    from .query.exec import _shape_pred, read_docmap

    docmap = read_docmap(spark, index_dir, manifest)
    pred = _shape_pred(fe, q.relation, q.geometry)
    out = docmap.filter(pred)
    from .deletes import has_tombstones, read_tombstones

    if has_tombstones(index_dir, manifest):
        out = out.join(
            read_tombstones(spark, index_dir, manifest),
            ["segment_id", "doc"], "left_anti",
        )
    return out

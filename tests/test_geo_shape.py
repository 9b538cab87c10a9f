"""geo_shape fields: polygon documents queried with point/bbox
relations — the ES ``geo_shape`` / Lucene LatLonShape analog (polygon
subset), filter-then-verify: 4 bbox docmap columns prune (parquet
min/max stats, the BKD-filter analog), an Arrow-vectorized ring test
verifies exactly.

The expected sets here come from an INDEPENDENT pure-Python geometry
reference (textbook division-form ray cast + orientation-based segment
intersection) — not from the engine's division-free vectorized kernels.
"""

import pytest

from ostrich_spark.build import build_index
from ostrich_spark.geo import parse_ring, shape_search
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import attach_docmap, search, search_sorted
from ostrich_spark.query.parser import (
    FILTER,
    MUST,
    BooleanQuery,
    GeoShapeQuery,
    QueryParseError,
    TermQuery,
    parse_query,
)
from ostrich_spark.schema import Schema

NOTCH = "55,-5;55,-1;50,-0.1;55,1;55,14;45,14.5;39,-5.5"  # concave
SQUARE = "10,10;10,12;12,12;12,10"
TRIANGLE = "-25,-25;-25,-15;-15,-20"
FAR = "80,170;80,171;81,171;81,170"

DOCS = [
    (0, "europe region", NOTCH),
    (1, "square zone", SQUARE),
    (2, "triangle south", TRIANGLE),
    (3, "no shape here", None),
    (4, "far north", FAR),
]


# --- independent reference geometry (division form, per-edge loops) ---------


def _ref_point_in(ring, lat, lon):
    inside = False
    n = len(ring)
    for i in range(n):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xc = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
            if lon < xc:
                inside = not inside
    return inside


def _ref_seg_cross(a, b, c, d):
    def o(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return (v > 0) - (v < 0)

    return o(a, b, c) * o(a, b, d) < 0 and o(c, d, a) * o(c, d, b) < 0


def _ref_bbox_intersects(ring, top, left, bottom, right):
    for lat, lon in ring:
        if bottom < lat < top and left < lon < right:
            return True
    for c in ((top, left), (top, right), (bottom, left), (bottom, right)):
        if _ref_point_in(ring, *c):
            return True
    corners = [(left, bottom), (right, bottom), (right, top), (left, top)]
    sides = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    n = len(ring)
    for i in range(n):
        a = (ring[i][1], ring[i][0])
        b = (ring[(i + 1) % n][1], ring[(i + 1) % n][0])
        for c, d in sides:
            if _ref_seg_cross(a, b, c, d):
                return True
    return False


def _schema():
    s = Schema()
    s.add_text_field("text", "default")
    s.add_shape_field("area")
    return s


@pytest.fixture(scope="module")
def shape_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, area string")
    idx = str(tmp_path_factory.mktemp("shape") / "idx")
    build_index(spark, df, _schema(), idx, num_partitions=2,
                order_col="doc_id", id_cols=["doc_id"])
    return idx


def _rings():
    return {d: parse_ring(s) for d, _, s in DOCS if s is not None}


def _ids(df, spark, idx):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_point_intersects_vs_reference(spark, shape_index):
    cases = [
        (48.8566, 2.3522),   # paris: inside the notch
        (51.5074, -0.1278),  # london: excluded by the concave notch
        (11.0, 11.0),        # square center
        (-20.0, -20.0),      # triangle interior
        (0.0, 0.0),          # nobody
        (80.5, 170.5),       # far square
    ]
    for lat, lon in cases:
        got = _ids(shape_search(spark, shape_index, "area", "intersects",
                                ("point", lat, lon)), spark, shape_index)
        exp = {d for d, ring in _rings().items()
               if _ref_point_in(ring, lat, lon)}
        assert got == exp, (lat, lon)
        assert 3 not in got  # no shape never matches


def test_bbox_relations_vs_reference(spark, shape_index):
    boxes = [
        (60.0, -10.0, 35.0, 20.0),     # contains the whole notch
        (11.5, 9.0, 10.5, 13.0),       # plus-sign slab through the square
        (11.4, 10.4, 10.6, 11.6),      # box entirely INSIDE the square
        (10.5, 9.0, 9.0, 10.5),        # corner overlap with the square
        (-16.0, -21.0, -17.0, -19.0),  # small box inside the triangle
        (5.0, 30.0, -5.0, 40.0),       # disjoint from everything
    ]
    rings = _rings()
    for top, left, bottom, right in boxes:
        got = _ids(shape_search(spark, shape_index, "area", "intersects",
                                ("bbox", top, left, bottom, right)),
                   spark, shape_index)
        exp = {d for d, ring in rings.items()
               if _ref_bbox_intersects(ring, top, left, bottom, right)}
        assert got == exp, ("intersects", top, left, bottom, right)
        # disjoint = shaped docs minus intersecting (doc 3 never)
        gotd = _ids(shape_search(spark, shape_index, "area", "disjoint",
                                 ("bbox", top, left, bottom, right)),
                    spark, shape_index)
        assert gotd == set(rings) - exp, ("disjoint", top)
    # within: ring bbox fully inside the query box (exact, column-only)
    got = _ids(shape_search(spark, shape_index, "area", "within",
                            ("bbox", 13.0, 9.0, 9.0, 13.0)),
               spark, shape_index)
    assert got == {1}
    got = _ids(shape_search(spark, shape_index, "area", "within",
                            ("bbox", 90.0, -180.0, -90.0, 180.0)),
               spark, shape_index)
    assert got == {0, 1, 2, 4}
    # inclusive at the exact bbox of the square
    got = _ids(shape_search(spark, shape_index, "area", "within",
                            ("bbox", 12.0, 10.0, 10.0, 12.0)),
               spark, shape_index)
    assert got == {1}


def test_query_composition_filter_context(spark, shape_index):
    base = {r["doc_id"]: r["score"] for r in attach_docmap(
        spark, shape_index,
        search(spark, shape_index, "text:zone OR text:region",
               limit=None)[0]).collect()}
    sch = load_manifest(shape_index).schema
    fid = sch.field_by_name("area").id
    q = BooleanQuery([
        (MUST, parse_query("text:zone OR text:region", sch)),
        (FILTER, GeoShapeQuery(fid, "intersects", ("point", 11.0, 11.0))),
    ])
    got = {r["doc_id"]: r["score"] for r in attach_docmap(
        spark, shape_index,
        search(spark, shape_index, q, limit=None)[0]).collect()}
    # membership narrowed to the square doc, text score untouched
    assert set(got) == {1} and got[1] == base[1]
    # exists has NQL form; everything else is DSL-only
    res, _ = search(spark, shape_index, "area:*", limit=None)
    assert {r["doc_id"] for r in attach_docmap(
        spark, shape_index, res).collect()} == {0, 1, 2, 4}
    with pytest.raises(QueryParseError, match="no query-string"):
        parse_query("area:oops", sch)


def test_merge_carries_shapes(spark, tmp_path):
    from ostrich_spark.merge import merge_segments

    df = spark.createDataFrame(DOCS, "doc_id long, text string, area string")
    idx = str(tmp_path / "m")
    build_index(spark, df, _schema(), idx, num_partitions=3,
                order_col="doc_id", id_cols=["doc_id"])
    before = _ids(shape_search(spark, idx, "area", "intersects",
                               ("point", 11.0, 11.0)), spark, idx)
    m = load_manifest(idx)
    merge_segments(spark, idx, [s.segment_id for s in m.segments], "mrg-0")
    after = _ids(shape_search(spark, idx, "area", "intersects",
                              ("point", 11.0, 11.0)), spark, idx)
    assert before == after == {1}


def test_validation(spark, tmp_path):
    with pytest.raises(QueryParseError, match="intersects"):
        GeoShapeQuery(0, "within", ("point", 1.0, 2.0))
    with pytest.raises(QueryParseError, match="wrap"):
        GeoShapeQuery(0, "intersects", ("bbox", 10.0, 170.0, -10.0, -170.0))
    with pytest.raises(QueryParseError, match="relation"):
        GeoShapeQuery(0, "overlaps", ("bbox", 10.0, 0.0, 0.0, 10.0))
    with pytest.raises(QueryParseError, match="geometry"):
        GeoShapeQuery(0, "intersects", ("circle", 0.0, 0.0, 5.0))
    with pytest.raises(ValueError, match="degenerate"):
        parse_ring("5,0;5,1;5,2")
    with pytest.raises(ValueError, match="not 'lat,lon'"):
        parse_ring("5;6;7")
    # malformed ring at build is loud
    bad = spark.createDataFrame([(9, "x", "1,2;3,4")],
                                "doc_id long, text string, area string")
    with pytest.raises(Exception, match="geo_shape|at least 3|PythonException"):
        build_index(spark, bad, _schema(), str(tmp_path / "b"),
                    num_partitions=1, order_col="doc_id",
                    id_cols=["doc_id"])
    # shapes have no doc-value sort
    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string, area string")
    idx = str(tmp_path / "v")
    build_index(spark, df, _schema(), idx, num_partitions=1,
                order_col="doc_id", id_cols=["doc_id"])
    with pytest.raises(ValueError, match="no total order"):
        search_sorted(spark, idx, "area:*", "area", limit=5)


def test_prune_pushdown_plan(spark, shape_index):
    """The bbox conjuncts of a shape query reach the parquet scan as
    PushedFilters — the filter-then-verify contract (only the ring
    verify stays above the scan)."""
    df = shape_search(spark, shape_index, "area", "intersects",
                      ("point", 11.0, 11.0))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "area__smin_lat" in plan


def test_cli_geo_shape(shape_index):
    import subprocess
    import sys

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "geo", "shape", *extra,
             "-p", shape_index, "-f", "area"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run("--point", "11,11")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "1 docs" in out.stdout
    out = run("--box", "60,-10,35,20", "--relation", "within")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "1 docs" in out.stdout  # the notch ring only
    out = run("--box", "60,-10,35,20", "--relation", "disjoint")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "3 docs" in out.stdout  # square, triangle, far
    out = run("--point", "11,11", "--relation", "within")
    assert out.returncode == 2 and "intersects" in out.stderr

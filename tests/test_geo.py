"""Geo-point fields: build, distance/bbox queries (standalone + composed
in boolean trees), nearest-k sort, geohash/geotile grids, merge/delete
interaction, and input validation.

Reference basis: the reference engine has text fields only; this is the
Elasticsearch geo_point surface (geo_distance / geo_bounding_box /
geohash_grid / geotile_grid, sort _geo_distance) re-expressed as docmap
column-pair scans (SURVEY.md §2 extension rows)."""

import math

import pytest
from pyspark.sql import functions as F

from ostrich_spark.build import build_index
from ostrich_spark.geo import (
    EARTH_RADIUS_M,
    geo_bounding_box_search,
    geo_distance_search,
    geo_sort,
    geohash_col,
    geohash_grid,
    geohash_py,
    geotile_grid,
    geotile_xy,
    haversine_m,
)
from ostrich_spark.manifest import load_manifest
from ostrich_spark.query.exec import search
from ostrich_spark.query.parser import (
    FILTER,
    MUST,
    BooleanQuery,
    GeoBoundingBoxQuery,
    GeoDistanceQuery,
    QueryParseError,
    parse_query,
)
from ostrich_spark.schema import Schema


def hav_py(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = (p2 - p1) / 2
    dlam = (math.radians(lon2) - math.radians(lon1)) / 2
    a = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


CITIES = [
    # id, name text, "lat,lon"
    (0, "paris tower", "48.8566,2.3522"),
    (1, "london bridge", "51.5074,-0.1278"),
    (2, "berlin gate", "52.52,13.405"),
    (3, "madrid plaza", "40.4168,-3.7038"),
    (4, "rome forum", "41.9028,12.4964"),
    (5, "auckland harbour", "-36.8485,174.7633"),
    (6, "suva reef", "-18.1248,178.4501"),
    (7, "apia beach", "-13.8507,-171.7514"),  # west of the dateline
    (8, "no point here", None),
    (9, "empty point", ""),
]


@pytest.fixture(scope="module")
def geo_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("geoidx") / "idx")
    df = spark.createDataFrame(
        [(i, t, p) for i, t, p in CITIES], "id long, text string, loc string"
    )
    schema = Schema()
    schema.add_text_field("text", "default")
    schema.add_geo_field("loc")
    build_index(
        spark, df, schema, d, num_partitions=2, order_col="id",
        id_cols=["id"], build_id="geo-t",
    )
    return d


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


class TestDistance:
    def test_within_radius_matches_brute_force(self, spark, geo_index):
        origin = (48.8566, 2.3522)  # paris
        for radius in (1.0, 400_000.0, 1_200_000.0, 25_000_000.0):
            got = _ids(
                geo_distance_search(spark, geo_index, "loc", *origin, radius)
            )
            want = sorted(
                i
                for i, _, p in CITIES
                if p
                and hav_py(*origin, *map(float, p.split(","))) <= radius
            )
            assert got == want, radius

    def test_distance_column_close_to_python(self, spark, geo_index):
        rows = geo_distance_search(
            spark, geo_index, "loc", 48.8566, 2.3522, 3e7
        ).select("id", "distance_m").collect()
        for r in rows:
            p = dict((i, p) for i, _, p in CITIES)[r["id"]]
            want = hav_py(48.8566, 2.3522, *map(float, p.split(",")))
            assert r["distance_m"] == pytest.approx(want, rel=1e-12)

    def test_missing_points_never_match(self, spark, geo_index):
        got = _ids(geo_distance_search(spark, geo_index, "loc", 0, 0, 3e7))
        assert 8 not in got and 9 not in got
        assert got == [0, 1, 2, 3, 4, 5, 6, 7]

    def test_known_distance_paris_london(self):
        # great-circle Paris->London is ~343.9 km on the IUGG sphere
        assert hav_py(48.8566, 2.3522, 51.5074, -0.1278) == pytest.approx(
            343_900, abs=1_500
        )


class TestBBox:
    def test_europe_box(self, spark, geo_index):
        got = _ids(
            geo_bounding_box_search(spark, geo_index, "loc", 55, -5, 40, 15)
        )
        assert got == [0, 1, 2, 3, 4]

    def test_inclusive_bounds(self, spark, geo_index):
        # top/left exactly on berlin
        got = _ids(
            geo_bounding_box_search(
                spark, geo_index, "loc", 52.52, 13.405, 50, 14
            )
        )
        assert 2 in got

    def test_dateline_wrap(self, spark, geo_index):
        # box crossing the antimeridian: fiji (178.45) and samoa (-171.75)
        got = _ids(
            geo_bounding_box_search(spark, geo_index, "loc", 0, 170, -40, -160)
        )
        assert got == [5, 6, 7]

    def test_non_wrapping_excludes_far_side(self, spark, geo_index):
        got = _ids(
            geo_bounding_box_search(spark, geo_index, "loc", 0, 170, -40, 179)
        )
        assert got == [5, 6]


class TestQueryTreeComposition:
    def test_geo_distance_as_filter_clause(self, spark, geo_index):
        mf = load_manifest(geo_index)
        fe = mf.schema.field_by_name("loc")
        q = BooleanQuery(
            [
                (MUST, parse_query("text:tower OR text:bridge OR text:harbour", mf.schema)),
                (FILTER, GeoDistanceQuery(fe.id, 48.8566, 2.3522, 1_000_000)),
            ]
        )
        res, _ = search(spark, geo_index, q, limit=None, manifest=mf)
        from ostrich_spark.query.exec import attach_docmap

        ids = sorted(
            r["id"] for r in attach_docmap(spark, geo_index, res, manifest=mf)
            .select("id").collect()
        )
        # tower(paris) + bridge(london) within 1000km of paris; auckland out
        assert ids == [0, 1]

    def test_geo_bbox_scoring_clause_constant_score(self, spark, geo_index):
        mf = load_manifest(geo_index)
        fe = mf.schema.field_by_name("loc")
        res, _ = search(
            spark, geo_index,
            GeoBoundingBoxQuery(fe.id, 55, -5, 40, 15, boost=2.5),
            limit=None, manifest=mf,
        )
        rows = res.collect()
        assert len(rows) == 5
        assert all(r["score"] == pytest.approx(2.5) for r in rows)

    def test_nql_rejects_geo_value_syntax(self, spark, geo_index):
        mf = load_manifest(geo_index)
        with pytest.raises(QueryParseError, match="no query-string syntax"):
            parse_query("loc:48.8,2.3", mf.schema)

    def test_nql_exists_on_geo(self, spark, geo_index):
        mf = load_manifest(geo_index)
        res, _ = search(spark, geo_index, "loc:*", limit=None, manifest=mf)
        assert res.count() == 8  # docs 8/9 have no point

    def test_validation(self):
        with pytest.raises(QueryParseError):
            GeoDistanceQuery(0, 91, 0, 10)
        with pytest.raises(QueryParseError):
            GeoDistanceQuery(0, 0, 0, 0)
        with pytest.raises(QueryParseError):
            GeoBoundingBoxQuery(0, top=10, left=0, bottom=20, right=5)


class TestSort:
    def test_nearest_k_matches_python(self, spark, geo_index):
        origin = (41.0, 5.0)
        got = [
            r["id"]
            for r in geo_sort(
                spark, geo_index, "loc", *origin, k=4, tiebreak="id"
            ).select("id").collect()
        ]
        want = sorted(
            (i for i, _, p in CITIES if p),
            key=lambda i: (
                hav_py(*origin, *map(float, dict((c[0], c[2]) for c in CITIES)[i].split(","))),
                i,
            ),
        )[:4]
        assert got == want

    def test_exact_tie_duplicate_points_deterministic(self, spark, tmp_path):
        # two docs at the SAME point are exact float ties — the tiebreak
        # column must give a deterministic total order
        d = str(tmp_path / "tie")
        df = spark.createDataFrame(
            [(0, "a", "10.0,20.0"), (1, "b", "10.0,20.0")],
            "id long, text string, loc string",
        )
        s = Schema()
        s.add_text_field("text", "default")
        s.add_geo_field("loc")
        build_index(spark, df, s, d, num_partitions=1, order_col="id",
                    id_cols=["id"], build_id="tie")
        rows = geo_sort(spark, d, "loc", 10.0, 3.0, k=2, tiebreak="id").collect()
        d0 = [r["distance_m"] for r in rows]
        assert d0[0] == d0[1]  # bitwise-equal distances
        assert [r["id"] for r in rows] == [0, 1]


class TestGrids:
    @pytest.mark.parametrize("precision", [1, 3, 5, 7])
    def test_geohash_matches_textbook_reference(self, spark, precision):
        pts = [
            (48.8566, 2.3522), (51.5074, -0.1278), (-36.8485, 174.7633),
            (0.0, 0.0), (-90.0, -180.0), (89.999, 179.999),
            (-13.8507, -171.7514), (0.3, 0.3), (-0.3, -0.3),
        ]
        df = spark.createDataFrame(pts, "lat double, lon double")
        got = [
            r["h"]
            for r in df.select(geohash_col("lat", "lon", precision).alias("h")).collect()
        ]
        want = [geohash_py(lat, lon, precision) for lat, lon in pts]
        assert got == want

    def test_geohash_known_cell(self, spark):
        # u09t is the classic geohash-4 for central paris
        df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
        assert df.select(geohash_col("lat", "lon", 4).alias("h")).first()["h"] == "u09t"
        assert geohash_py(48.8566, 2.3522, 4) == "u09t"

    def test_geohash_right_edge_clamped(self, spark):
        df = spark.createDataFrame([(90.0, 180.0)], "lat double, lon double")
        h = df.select(geohash_col("lat", "lon", 2).alias("h")).first()["h"]
        assert h == geohash_py(89.9999999, 179.9999999, 2) == "zz"

    def test_geohash_grid_counts(self, spark, geo_index):
        rows = geohash_grid(spark, geo_index, "loc", precision=1).collect()
        got = {r["geohash"]: r["doc_count"] for r in rows}
        want = {}
        for _, _, p in CITIES:
            if p:
                h = geohash_py(*map(float, p.split(",")), 1)
                want[h] = want.get(h, 0) + 1
        assert got == want

    def test_geotile_xy_matches_python(self, spark):
        z = 7
        pts = [(48.8566, 2.3522), (-36.8485, 174.7633), (0.3, 0.3), (85.0, -179.0)]
        df = spark.createDataFrame(pts, "lat double, lon double")
        x, y = geotile_xy("lat", "lon", z)
        got = df.select(x.alias("x"), y.alias("y")).collect()
        n = 1 << z
        for (lat, lon), r in zip(pts, got):
            wx = min(n - 1, max(0, math.floor((lon + 180) / 360 * n)))
            m = math.log(math.tan(math.radians(lat)) + 1 / math.cos(math.radians(lat)))
            wy = min(n - 1, max(0, math.floor((1 - m / math.pi) / 2 * n)))
            assert (r["x"], r["y"]) == (wx, wy)

    def test_geotile_grid_counts(self, spark, geo_index):
        rows = geotile_grid(spark, geo_index, "loc", zoom=3).collect()
        assert sum(r["doc_count"] for r in rows) == 8
        n = 1 << 3
        want = {}
        for _, _, p in CITIES:
            if p:
                lat, lon = map(float, p.split(","))
                wx = min(n - 1, max(0, math.floor((lon + 180) / 360 * n)))
                m = math.log(math.tan(math.radians(lat)) + 1 / math.cos(math.radians(lat)))
                wy = min(n - 1, max(0, math.floor((1 - m / math.pi) / 2 * n)))
                want[(wx, wy)] = want.get((wx, wy), 0) + 1
        got = {(r["tile_x"], r["tile_y"]): r["doc_count"] for r in rows}
        assert got == want


class TestCLI:
    def test_cli_geo_modes(self, geo_index):
        import subprocess
        import sys

        def run(*extra):
            return subprocess.run(
                [sys.executable, "-m", "ostrich_spark", "geo", *extra,
                 "-p", geo_index, "-f", "loc"],
                capture_output=True, text=True, timeout=300, cwd="/root/repo",
            )

        out = run("distance", "--origin", "48.8566,2.3522", "--radius-m", "400000")
        assert out.returncode == 0, out.stderr[-2000:]
        body = [l for l in out.stdout.splitlines() if l.endswith("m") or "m " in l]
        assert any("id=0" in l for l in body)  # paris itself
        assert any("id=1" in l for l in body)  # london at ~344km
        assert "2 docs" in out.stdout

        out = run("nearest", "--origin", "41.0,5.0", "-k", "3", "--tiebreak", "id")
        assert out.returncode == 0, out.stderr[-2000:]
        assert "3 docs" in out.stdout

        out = run("bbox", "--box", "55,-5,40,15")
        assert out.returncode == 0, out.stderr[-2000:]
        assert "5 docs" in out.stdout

        out = run("geohash", "--precision", "1")
        assert out.returncode == 0, out.stderr[-2000:]
        cells = [l for l in out.stdout.splitlines() if " " in l and "cells" not in l]
        assert sum(int(l.split()[1]) for l in cells) == 8

        out = run("geotile", "--zoom", "3")
        assert out.returncode == 0, out.stderr[-2000:]
        assert any(l.startswith("3/") for l in out.stdout.splitlines())

        bad = run("distance", "--origin", "48.8,2.3")  # missing radius
        assert bad.returncode == 2

        out = run("rings", "--origin", "48.8566,2.3522", "--ranges",
                  "near::500000,far:500000:")
        assert out.returncode == 0, out.stderr[-2000:]
        assert "near [* TO 500000.0)m 2" in out.stdout  # paris + london
        assert "far [500000.0 TO *)m 6" in out.stdout
        assert "2 rings" in out.stdout

        bad = run("rings", "--origin", "0,0", "--ranges", "notaspec")
        assert bad.returncode == 2
        bad = run("rings", "--ranges", "a::")  # missing origin
        assert bad.returncode == 2


class TestLifecycle:
    def test_merge_preserves_geo(self, spark, tmp_path):
        from ostrich_spark.merge import consider_merges

        d = str(tmp_path / "m")
        df = spark.createDataFrame(
            [(i, t, p) for i, t, p in CITIES], "id long, text string, loc string"
        )
        s = Schema()
        s.add_text_field("text", "default")
        s.add_geo_field("loc")
        build_index(spark, df, s, d, num_partitions=4, order_col="id",
                    id_cols=["id"], build_id="geo-m")
        before = _ids(geo_distance_search(spark, d, "loc", 48.8566, 2.3522, 1_200_000))
        created = consider_merges(spark, d, policy_kwargs={"min_num_segments": 2})
        assert created  # 4 tiny segments must merge
        after = _ids(geo_distance_search(spark, d, "loc", 48.8566, 2.3522, 1_200_000))
        assert before == after != []

    def test_tombstoned_docs_excluded(self, spark, tmp_path):
        from ostrich_spark.deletes import delete_docs

        d = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, t, p) for i, t, p in CITIES], "id long, text string, loc string"
        )
        s = Schema()
        s.add_text_field("text", "default")
        s.add_geo_field("loc")
        build_index(spark, df, s, d, num_partitions=2, order_col="id",
                    id_cols=["id"], build_id="geo-d")
        match_df = spark.createDataFrame([(0,)], "id long")
        delete_docs(spark, d, match_df, ["id"])
        got = _ids(geo_distance_search(spark, d, "loc", 48.8566, 2.3522, 3e7))
        assert 0 not in got and got == [1, 2, 3, 4, 5, 6, 7]
        grid = geohash_grid(spark, d, "loc", 1)
        assert sum(r["doc_count"] for r in grid.collect()) == 7

    def test_build_rejects_bad_input(self, spark, tmp_path):
        s = Schema()
        s.add_text_field("text", "default")
        s.add_geo_field("loc")
        df = spark.createDataFrame(
            [(0, "x", "95.0,10.0")], "id long, text string, loc string"
        )
        with pytest.raises(Exception, match="latitude|geo"):
            build_index(spark, df, s, str(tmp_path / "bad1"),
                        num_partitions=1, order_col="id", id_cols=["id"],
                        build_id="b1")
        df2 = spark.createDataFrame(
            [(0, "x", "48.85")], "id long, text string, loc string"
        )
        with pytest.raises(Exception, match="comma|geo"):
            build_index(spark, df2, s, str(tmp_path / "bad2"),
                        num_partitions=1, order_col="id", id_cols=["id"],
                        build_id="b2")


class TestCentroidBounds:
    def test_centroid_hand_mean(self, spark, geo_index):
        from ostrich_spark.geo import geo_centroid

        pts = [tuple(map(float, p.split(","))) for _, _, p in CITIES if p]
        row = geo_centroid(spark, geo_index, "loc").collect()[0]
        assert row["count"] == len(pts)
        assert row["lat"] == pytest.approx(
            sum(la for la, _ in pts) / len(pts), rel=1e-12
        )
        assert row["lon"] == pytest.approx(
            sum(lo for _, lo in pts) / len(pts), rel=1e-12
        )

    def test_centroid_query_context_and_empty(self, spark, geo_index):
        from ostrich_spark.geo import geo_centroid

        # only 'paris tower' matches -> centroid IS that point
        row = geo_centroid(spark, geo_index, "loc", query="text:paris").collect()[0]
        assert (row["lat"], row["lon"], row["count"]) == pytest.approx(
            (48.8566, 2.3522, 1)
        )
        row = geo_centroid(
            spark, geo_index, "loc", query="text:zzznomatch"
        ).collect()[0]
        assert row["count"] == 0 and row["lat"] is None

    def test_bounds_box_and_no_wrap(self, spark, geo_index):
        from ostrich_spark.geo import geo_bounds

        pts = [tuple(map(float, p.split(","))) for _, _, p in CITIES if p]
        row = geo_bounds(spark, geo_index, "loc").collect()[0]
        assert row["top"] == max(la for la, _ in pts)
        assert row["bottom"] == min(la for la, _ in pts)
        # wrap_longitude=false: apia (-171.75) and suva (178.45) stretch
        # the box across the globe instead of wrapping the dateline
        assert row["left"] == min(lo for _, lo in pts)
        assert row["right"] == max(lo for _, lo in pts)
        assert row["count"] == len(pts)

    def test_validation(self, spark, geo_index):
        from ostrich_spark.geo import geo_bounds, geo_centroid

        with pytest.raises(ValueError, match="geo field"):
            geo_centroid(spark, geo_index, "text")
        with pytest.raises(ValueError, match="geo field"):
            geo_bounds(spark, geo_index, "text")


class TestDistanceRings:
    def test_rings_match_brute_force(self, spark, geo_index):
        from ostrich_spark.geo import geo_distance_agg

        origin = (48.8566, 2.3522)  # paris
        rings = [
            ("near", None, 500_000.0),
            ("mid", 500_000.0, 2_000_000.0),
            ("far", 2_000_000.0, None),
            ("all", None, None),              # overlaps: double-counts
            ("empty", 30_000_000.0, 31_000_000.0),  # declared-but-empty
        ]
        rows = geo_distance_agg(
            spark, geo_index, "loc", *origin, rings
        ).collect()
        assert [r["range_key"] for r in rows] == [k for k, _, _ in rings]
        dists = [
            hav_py(*origin, *map(float, p.split(",")))
            for _, _, p in CITIES if p
        ]
        by = {r["range_key"]: r for r in rows}
        assert by["near"]["n_docs"] == sum(d < 5e5 for d in dists)
        assert by["mid"]["n_docs"] == sum(5e5 <= d < 2e6 for d in dists)
        assert by["far"]["n_docs"] == sum(d >= 2e6 for d in dists)
        assert by["all"]["n_docs"] == len(dists)
        assert by["empty"]["n_docs"] == 0
        assert (
            by["near"]["n_docs"] + by["mid"]["n_docs"] + by["far"]["n_docs"]
            == len(dists)
        )

    def test_rings_query_context_and_metrics(self, spark, geo_index):
        from ostrich_spark.geo import geo_distance_agg

        rows = geo_distance_agg(
            spark, geo_index, "loc", 48.8566, 2.3522,
            [("any", None, None)], query="text:bridge",
            metrics={"max_id": ("max", "id")},
        ).collect()
        assert rows[0]["n_docs"] == 1  # only london bridge
        assert rows[0]["max_id"] == 1

    def test_rings_validation(self, spark, geo_index):
        from ostrich_spark.geo import geo_distance_agg

        with pytest.raises(ValueError, match=">= 1"):
            geo_distance_agg(spark, geo_index, "loc", 0, 0, [])
        with pytest.raises(ValueError, match="duplicate"):
            geo_distance_agg(
                spark, geo_index, "loc", 0, 0,
                [("a", None, 1.0), ("a", 1.0, None)],
            )
        with pytest.raises(ValueError, match=">= 0 meters"):
            geo_distance_agg(
                spark, geo_index, "loc", 0, 0, [("a", -5.0, None)]
            )


def _ray_cast_py(lat, lon, points):
    """Independent planar even-odd reference (the textbook algorithm,
    written differently from polygon_pred: division form)."""
    pts = list(points)
    inside = False
    n = len(pts)
    for i in range(n):
        yi, xi = pts[i]
        yj, xj = pts[(i + 1) % n]
        if (yi > lat) != (yj > lat):
            x_cross = xi + (xj - xi) * (lat - yi) / (yj - yi)
            if lon < x_cross:
                inside = not inside
    return inside


class TestPolygon:
    # a CONCAVE ring over western Europe: the notch (dipping to lat 50
    # between lon -1 and 1) excludes London while Paris, inside the
    # lower body, matches — the shape no bounding box can express
    RING = [(55.0, -5.0), (55.0, -1.0), (50.0, -0.1), (55.0, 1.0),
            (55.0, 14.0), (45.0, 14.5), (39.0, -5.5)]

    def test_concave_matches_brute_force(self, spark, geo_index):
        from ostrich_spark.geo import geo_polygon_search

        got = _ids(geo_polygon_search(spark, geo_index, "loc", self.RING))
        exp = sorted(
            i for i, _, p in CITIES
            if p
            for la, lo in [tuple(float(x) for x in p.split(","))]
            if _ray_cast_py(la, lo, self.RING)
        )
        assert got == exp
        # the notch does its job: London out, Paris + Berlin in
        assert 1 not in got and {0, 2} <= set(got)
        # null/empty points never match
        assert 8 not in got and 9 not in got

    def test_query_node_filter_composition(self, spark, geo_index):
        from ostrich_spark.query.parser import GeoPolygonQuery

        mf = load_manifest(geo_index)
        fe = mf.schema.field_by_name("loc")
        q = BooleanQuery([
            (MUST, parse_query("text:tower OR text:bridge OR text:gate",
                               mf.schema)),
            (FILTER, GeoPolygonQuery(fe.id, tuple(self.RING))),
        ])
        res, _ = search(spark, geo_index, q, limit=None, manifest=mf)
        from ostrich_spark.query.exec import attach_docmap

        ids = sorted(
            r["id"] for r in attach_docmap(
                spark, geo_index, res, manifest=mf).collect()
        )
        assert ids == [0, 2]  # tower(paris), gate(berlin); bridge filtered

    def test_geojson_closed_form_and_bbox_equivalence(self, spark, geo_index):
        from ostrich_spark.geo import geo_polygon_search

        closed = self.RING + [self.RING[0]]
        assert _ids(
            geo_polygon_search(spark, geo_index, "loc", closed)
        ) == _ids(geo_polygon_search(spark, geo_index, "loc", self.RING))
        # a rectangle polygon == the inclusive bbox minus its boundary
        # (strict even-odd vs inclusive box): choose bounds OFF the data
        rect = [(56.0, -6.0), (56.0, 15.0), (39.5, 15.0), (39.5, -6.0)]
        got = _ids(geo_polygon_search(spark, geo_index, "loc", rect))
        box = _ids(
            geo_bounding_box_search(spark, geo_index, "loc",
                                    56.0, -6.0, 39.5, 15.0)
        )
        assert got == box

    def test_validation(self, spark, geo_index):
        from ostrich_spark.geo import geo_polygon_search
        from ostrich_spark.query.parser import GeoPolygonQuery

        with pytest.raises(ValueError, match=">= 3"):
            geo_polygon_search(spark, geo_index, "loc",
                               [(0.0, 0.0), (1.0, 1.0)])
        with pytest.raises(ValueError, match="out of range"):
            geo_polygon_search(spark, geo_index, "loc",
                               [(91.0, 0.0), (0.0, 1.0), (1.0, 0.0)])
        with pytest.raises(ValueError, match="dateline"):
            geo_polygon_search(spark, geo_index, "loc",
                               [(0.0, -170.0), (10.0, 170.0), (5.0, 0.0)])
        with pytest.raises(ValueError, match="degenerate"):
            geo_polygon_search(spark, geo_index, "loc",
                               [(5.0, 0.0), (5.0, 1.0), (5.0, 2.0)])
        with pytest.raises(QueryParseError, match=">= 3"):
            GeoPolygonQuery(0, ((0.0, 0.0), (1.0, 1.0)))

    def test_cli_polygon(self, geo_index):
        import subprocess
        import sys

        n_exp = sum(
            1 for i, _, p in CITIES
            if p
            for la, lo in [tuple(float(x) for x in p.split(","))]
            if _ray_cast_py(la, lo, self.RING)
        )
        out = subprocess.run(
            [sys.executable, "-m", "ostrich_spark", "geo", "polygon",
             "-p", geo_index, "-f", "loc",
             "--points"] + [f"{la},{lo}" for la, lo in self.RING],
            capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr
        assert f"{n_exp} docs" in out.stdout

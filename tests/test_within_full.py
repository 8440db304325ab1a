"""Full-geometry ``within`` semantics (operators/within.py).

mbgl evaluates ``within`` over the whole feature geometry (the
reference accepts the op through /root/reference/src/filters.cpp:108-121):
all vertices inside, plus — for LineStrings — no segment properly
crossing a polygon boundary edge. The boundary-crossing case (all
vertices inside, segment clips a hole / concave notch) is exactly what
a representative-point evaluation gets wrong.
"""

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.operators.within import feature_within, shave_within

SF_TILE = "/root/reference/test/fixtures/tiles/sf_16_10465_25329.vector.pbf"

# Donut: outer 0..10 box with a 4..6 hole.
DONUT = {
    "type": "Polygon",
    "coordinates": [
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
        [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]],
    ],
}

VERT_SCHEMA = (
    "feature_id bigint, geom_type string, path_idx int, vertex_idx int, "
    "lon double, lat double"
)


def _verdicts(spark, rows):
    df = spark.createDataFrame(rows, VERT_SCHEMA)
    out = feature_within(df, DONUT, keys=("feature_id",))
    return {r["feature_id"]: r["within"] for r in out.collect()}


def test_line_crossing_hole_not_within(spark):
    # both vertices in the fill region, but the segment passes straight
    # through the hole -> properly crosses two hole edges -> NOT within
    rows = [
        (1, "LineString", 0, 0, 3.0, 5.0),
        (1, "LineString", 0, 1, 7.0, 5.0),
    ]
    assert _verdicts(spark, rows) == {1: False}


def test_line_clipping_hole_corner_not_within(spark):
    # diagonal that clips the hole's lower-left corner region (not
    # exactly through the corner point — that would be a collinear
    # touch, which proper-crossing excludes, as in mbgl)
    rows = [
        (2, "LineString", 0, 0, 3.5, 4.6),
        (2, "LineString", 0, 1, 4.6, 3.5),
    ]
    assert _verdicts(spark, rows) == {2: False}


def test_line_fully_inside_within(spark):
    rows = [
        (3, "LineString", 0, 0, 1.0, 1.0),
        (3, "LineString", 0, 1, 2.0, 1.5),
        (3, "LineString", 0, 2, 3.0, 3.0),
    ]
    assert _verdicts(spark, rows) == {3: True}


def test_line_vertex_outside_not_within(spark):
    rows = [
        (4, "LineString", 0, 0, 1.0, 1.0),
        (4, "LineString", 0, 1, 11.0, 1.0),
    ]
    assert _verdicts(spark, rows) == {4: False}


def test_line_vertex_in_hole_not_within(spark):
    rows = [
        (5, "LineString", 0, 0, 1.0, 5.0),
        (5, "LineString", 0, 1, 5.0, 5.0),
    ]
    assert _verdicts(spark, rows) == {5: False}


def test_point_semantics(spark):
    rows = [
        (6, "Point", 0, 0, 2.0, 2.0),   # in fill
        (7, "Point", 0, 0, 5.0, 5.0),   # in hole
        (8, "Point", 0, 0, 12.0, 2.0),  # outside
    ]
    assert _verdicts(spark, rows) == {6: True, 7: False, 8: False}


def test_multipoint_all_points_required(spark):
    # one point of the multipoint in the hole -> whole feature false
    rows = [
        (9, "Point", 0, 0, 2.0, 2.0),
        (9, "Point", 1, 0, 5.0, 5.0),
    ]
    assert _verdicts(spark, rows) == {9: False}


def test_polygon_feature_never_within(spark):
    rows = [
        (10, "Polygon", 0, 0, 1.0, 1.0),
        (10, "Polygon", 0, 1, 2.0, 1.0),
        (10, "Polygon", 0, 2, 2.0, 2.0),
        (10, "Polygon", 0, 3, 1.0, 1.0),
    ]
    assert _verdicts(spark, rows) == {10: False}


def test_multiline_paths_segment_mask(spark):
    # two paths, each fully inside; the phantom segment BETWEEN path 0's
    # last vertex (3,5) and path 1's first (7,5) would cross the hole —
    # the path mask must prevent it from counting
    rows = [
        (11, "LineString", 0, 0, 2.0, 5.0),
        (11, "LineString", 0, 1, 3.0, 5.0),
        (11, "LineString", 1, 0, 7.0, 5.0),
        (11, "LineString", 1, 1, 8.0, 5.0),
    ]
    assert _verdicts(spark, rows) == {11: True}


def test_real_tile_linestring_shave(spark):
    """Shave the reference's canonical sf tile's road layer (LineString
    features) with a within filter over the decoded REAL geometry."""
    from vtshaver_spark.sources.mvt import decode_tile_points, decode_tiles
    from vtshaver_spark.functions.geo import tile_bounds

    with open(SF_TILE, "rb") as f:
        blob = f.read()
    tiles = spark.createDataFrame(
        [(16, 10465, 25329, bytearray(blob))],
        "z int, x bigint, y bigint, tile binary",
    )
    verts = decode_tile_points(tiles).cache()
    feats = decode_tiles(tiles)

    lon_min, lat_min, lon_max, lat_max = tile_bounds(16, 10465, 25329)

    # polygon covering the whole tile (plus margin): every Point and
    # LineString feature is within; Polygon features never are
    margin = 0.01
    cover = {
        "type": "Polygon",
        "coordinates": [[
            [lon_min - margin, lat_min - margin],
            [lon_max + margin, lat_min - margin],
            [lon_max + margin, lat_max + margin],
            [lon_min - margin, lat_max + margin],
            [lon_min - margin, lat_min - margin],
        ]],
    }
    keys = ("z", "x", "y", "layer", "feature_id")
    all_roads = feats.filter(
        (F.col("layer") == "road") & (F.col("geom_type") == "LineString")
    )
    n_roads = all_roads.count()
    assert n_roads > 0
    kept_all = shave_within(all_roads, verts, cover, keys=keys)
    assert kept_all.count() == n_roads

    # polygon covering only the WESTERN half: strictly fewer roads
    # survive, and every surviving road's vertices are all in that half
    half = {
        "type": "Polygon",
        "coordinates": [[
            [lon_min - margin, lat_min - margin],
            [(lon_min + lon_max) / 2.0, lat_min - margin],
            [(lon_min + lon_max) / 2.0, lat_max + margin],
            [lon_min - margin, lat_max + margin],
            [lon_min - margin, lat_min - margin],
        ]],
    }
    kept_half = shave_within(all_roads, verts, half, keys=keys)
    n_half = kept_half.count()
    assert 0 < n_half < n_roads
    max_kept_lon = (
        verts.join(
            kept_half.select(*keys).distinct(), on=list(keys), how="left_semi"
        )
        .agg(F.max("lon"))
        .collect()[0][0]
    )
    assert max_kept_lon <= (lon_min + lon_max) / 2.0
    verts.unpersist()


def test_style_filter_within_routes_full_geometry(spark):
    """A style whose filter contains ["within"] shaved through the
    NORMAL shave() API with vertex_df must get full-geometry verdicts:
    a LineString whose vertices are all in the fill but whose segment
    crosses the hole is dropped (point/vertex-form would keep it), and
    negation composes (["!", within] keeps exactly that line)."""
    from vtshaver_spark import Filters, style_to_filters
    from vtshaver_spark.operators.shave import shave

    feats = spark.createDataFrame(
        [
            (16, 0, 0, "road", 1, "LineString", {"class": "street"}),
            (16, 0, 0, "road", 3, "LineString", {"class": "street"}),
            (16, 0, 0, "road", 10, "Polygon", {"class": "street"}),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, props map<string,string>",
    )
    verts = spark.createDataFrame(
        [
            # feature 1: crosses the hole (all vertices in the fill)
            (16, 0, 0, "road", 1, "LineString", 0, 0, 3.0, 5.0),
            (16, 0, 0, "road", 1, "LineString", 0, 1, 7.0, 5.0),
            # feature 3: fully inside
            (16, 0, 0, "road", 3, "LineString", 0, 0, 1.0, 1.0),
            (16, 0, 0, "road", 3, "LineString", 0, 1, 2.0, 1.5),
            # feature 10: polygon (never within)
            (16, 0, 0, "road", 10, "Polygon", 0, 0, 1.0, 1.0),
            (16, 0, 0, "road", 10, "Polygon", 0, 1, 2.0, 1.0),
            (16, 0, 0, "road", 10, "Polygon", 0, 2, 1.0, 1.0),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, path_idx int, vertex_idx int, lon double, lat double",
    )
    style = {"layers": [{"source-layer": "road", "filter": ["within", DONUT]}]}
    kept = shave(
        feats, Filters(style_to_filters(style)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    assert {r["feature_id"] for r in kept.collect()} == {3}

    neg = {"layers": [{"source-layer": "road",
                       "filter": ["!", ["within", DONUT]]}]}
    kept_neg = shave(
        feats, Filters(style_to_filters(neg)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    # full-geometry negation: crossing line and the Polygon (never
    # within) survive; without vertex_df this style would need lon/lat
    # row columns (point form) — the route is what makes it evaluable
    assert {r["feature_id"] for r in kept_neg.collect()} == {1, 10}

    # metrics path takes the same route: before/after counts reflect
    # whole-geometry semantics
    from vtshaver_spark.operators.shave import shave_with_metrics

    style2 = {"layers": [{"source-layer": "road", "filter": ["within", DONUT]}]}
    shaved, metrics = shave_with_metrics(
        feats, Filters(style_to_filters(style2)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    assert {r["feature_id"] for r in shaved.collect()} == {3}
    m = metrics.collect()[0]
    assert m["features_before"] == 3 and m["features_after"] == 1


def test_style_filter_distance_routes_full_geometry(spark):
    """["distance"] in a style filter with vertex_df binds the
    per-feature MIN vertex distance: near Point kept, far Point
    dropped, LineString judged by its CLOSEST vertex, and a feature
    with no vertex rows never matches (NULL distance)."""
    from vtshaver_spark import Filters, style_to_filters
    from vtshaver_spark.operators.shave import shave

    feats = spark.createDataFrame(
        [
            (16, 0, 0, "poi", 1, "Point", {"k": "v"}),
            (16, 0, 0, "poi", 2, "Point", {"k": "v"}),
            (16, 0, 0, "poi", 3, "LineString", {"k": "v"}),
            (16, 0, 0, "poi", 4, "Point", {"k": "v"}),  # no vertices
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, props map<string,string>",
    )
    verts = spark.createDataFrame(
        [
            (16, 0, 0, "poi", 1, "Point", 0, 0, 0.0, 0.0),        # at origin
            (16, 0, 0, "poi", 2, "Point", 0, 0, 10.0, 10.0),      # ~1560 km away
            (16, 0, 0, "poi", 3, "LineString", 0, 0, 9.0, 9.0),   # far vertex
            (16, 0, 0, "poi", 3, "LineString", 0, 1, 0.1, 0.1),   # near vertex
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, path_idx int, vertex_idx int, lon double, lat double",
    )
    style = {
        "layers": [{
            "source-layer": "poi",
            "filter": [
                "<",
                ["distance", {"type": "Point", "coordinates": [0.0, 0.0]}],
                100000,
            ],
        }]
    }
    kept = shave(
        feats, Filters(style_to_filters(style)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    assert {r["feature_id"] for r in kept.collect()} == {1, 3}


def test_distance_segment_interior_exact(spark):
    """mbgl measures TRUE geometry distance: a long straight segment
    whose interior passes near the query point must match ``distance <
    r`` even when every vertex is far (the r4 vertex-min upper bound
    wrongly excluded it). Feature 1: (-5,1)->(5,1) passes ~111 km from
    the origin at its midpoint while both vertices sit ~566 km out.
    Feature 2 is the control at lat 4 (interior ~444 km) — still out
    at r=200 km."""
    from vtshaver_spark import Filters, style_to_filters
    from vtshaver_spark.operators.shave import shave

    feats = spark.createDataFrame(
        [
            (16, 0, 0, "road", 1, "LineString", {"k": "v"}),
            (16, 0, 0, "road", 2, "LineString", {"k": "v"}),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, props map<string,string>",
    )
    verts = spark.createDataFrame(
        [
            (16, 0, 0, "road", 1, "LineString", 0, 0, -5.0, 1.0),
            (16, 0, 0, "road", 1, "LineString", 0, 1, 5.0, 1.0),
            (16, 0, 0, "road", 2, "LineString", 0, 0, -5.0, 4.0),
            (16, 0, 0, "road", 2, "LineString", 0, 1, 5.0, 4.0),
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, path_idx int, vertex_idx int, lon double, lat double",
    )
    style = {
        "layers": [{
            "source-layer": "road",
            "filter": [
                "<",
                ["distance", {"type": "Point", "coordinates": [0.0, 0.0]}],
                200000,
            ],
        }]
    }
    kept = shave(
        feats, Filters(style_to_filters(style)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    assert {r["feature_id"] for r in kept.collect()} == {1}


def test_point_segment_distance_sql_parity(spark):
    """The Column form and the SQL parity form of the point-to-segment
    distance produce BIT-EQUAL doubles (the oracle-hash contract) —
    interior foot, clamped-to-vertex, and degenerate zero-length
    segments included."""
    import duckdb

    from vtshaver_spark.functions.geo import (
        point_segment_distance_m,
        point_segment_distance_m_sql,
    )

    segs = [
        (-5.0, 1.0, 5.0, 1.0),     # interior foot
        (3.0, 4.0, 8.0, 9.0),      # clamps to t=0 vertex
        (-8.0, -9.0, -3.0, -4.0),  # clamps to t=1 vertex
        (2.5, 2.5, 2.5, 2.5),      # zero-length (len2 == 0 branch)
        (-122.7, 37.1, -121.3, 38.9),
    ]
    plon, plat = -122.0, 38.0
    df = spark.createDataFrame(segs, "x1 double, y1 double, x2 double, y2 double")
    got = [
        r["d"]
        for r in df.select(
            point_segment_distance_m(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"), plon, plat
            ).alias("d")
        ).collect()
    ]
    sql = point_segment_distance_m_sql("x1", "y1", "x2", "y2", plon, plat)
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {sql} FROM (SELECT CAST({a!r} AS DOUBLE) AS x1, "
            f"CAST({b!r} AS DOUBLE) AS y1, CAST({c!r} AS DOUBLE) AS x2, "
            f"CAST({d!r} AS DOUBLE) AS y2)"
        ).fetchone()[0]
        for a, b, c, d in segs
    ]
    assert got == want  # bit-equal, not approx


def test_distance_polygon_inside_zero(spark):
    """GL distance for Polygon features is 0 when the query point lies
    inside the fill (mbgl: shortest distance to the geometry) — a
    polygon surrounding the point matches ANY radius even though its
    boundary is far; a polygon not containing it is judged by
    boundary distance; a donut whose HOLE contains the point is NOT
    zero (even-odd across rings)."""
    from vtshaver_spark import Filters, style_to_filters
    from vtshaver_spark.operators.shave import shave

    feats = spark.createDataFrame(
        [
            (16, 0, 0, "landuse", 1, "Polygon", {"k": "v"}),  # surrounds P
            (16, 0, 0, "landuse", 2, "Polygon", {"k": "v"}),  # far square
            (16, 0, 0, "landuse", 3, "Polygon", {"k": "v"}),  # donut, P in hole
        ],
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, props map<string,string>",
    )

    def ring(fid, path, pts):
        return [
            (16, 0, 0, "landuse", fid, "Polygon", path, i, float(x), float(y))
            for i, (x, y) in enumerate(pts)
        ]

    sq = [(-2, -2), (2, -2), (2, 2), (-2, 2), (-2, -2)]
    far = [(5, 5), (9, 5), (9, 9), (5, 9), (5, 5)]
    hole = [(-1, -1), (1, -1), (1, 1), (-1, 1), (-1, -1)]
    verts = spark.createDataFrame(
        ring(1, 0, sq) + ring(2, 0, far) + ring(3, 0, sq) + ring(3, 1, hole),
        "z int, x bigint, y bigint, layer string, feature_id bigint, "
        "geom_type string, path_idx int, vertex_idx int, lon double, lat double",
    )
    style = {
        "layers": [{
            "source-layer": "landuse",
            "filter": [
                "<",
                ["distance", {"type": "Point", "coordinates": [0.0, 0.0]}],
                1000,
            ],
        }]
    }
    kept = shave(
        feats, Filters(style_to_filters(style)), zoom=16, maxzoom=16,
        vertex_df=verts,
    )
    assert {r["feature_id"] for r in kept.collect()} == {1}

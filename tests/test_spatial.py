"""kNN + point-in-polygon goldens (FIXTURES.md §4-5): engine results
must equal brute-force numpy references row-for-row."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtshaver_spark.operators.knn import (
    caption_landmark_join,
    knn_join_broadcast,
    knn_join_cells,
)
from vtshaver_spark.operators.pip import (
    from_polygons_df,
    pip_polygon_join,
    pip_rect_join,
    rect_rings,
)
from vtshaver_spark.sources.synthetic import landmarks_df, polygons_df, _u


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (f"img_{i:04d}", -180.0 + 360.0 * _u(f"pt/{i}/lon"), -80.0 + 160.0 * _u(f"pt/{i}/lat"))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "image_id string, lon double, lat double").cache()


@pytest.fixture(scope="module")
def landmarks(spark):
    return landmarks_df(spark, n=60).cache()


def brute_knn(points_rows, lm_rows, k=3):
    golden = {}
    for pid, plon, plat in points_rows:
        d = sorted(
            (( (plon - lon) ** 2 + (plat - lat) ** 2), lid)
            for lid, lon, lat in lm_rows
        )
        golden[pid] = [lid for _, lid in d[:k]]
    return golden


def test_knn_broadcast_matches_bruteforce(spark, points, landmarks):
    pts = [(r["image_id"], r["lon"], r["lat"]) for r in points.collect()]
    lms = [(r["landmark_id"], r["lon"], r["lat"]) for r in landmarks.collect()]
    golden = brute_knn(pts, lms, k=3)
    out = knn_join_broadcast(points, landmarks, k=3).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["image_id"], r["rank"])):
        got.setdefault(r["image_id"], []).append(r["landmark_id"])
    assert got == golden


def test_knn_broadcast_grid_matches_bruteforce(spark, points):
    """m >= 64 activates the grid-candidate selection path (r6): the
    result must stay row-identical to brute force — including points
    OUTSIDE the landmark bbox and clustered points (margin-check
    fallback rows), and k past the padded candidate window."""
    lms = landmarks_df(spark, n=200).cache()
    # clustered + out-of-bbox probes on top of the uniform fixture
    extra = [
        ("img_edge_n", 0.0, 89.5), ("img_edge_s", 0.0, -89.9),
        ("img_edge_w", -179.99, 0.0), ("img_edge_e", 179.99, 0.0),
        ("img_clust_1", -122.41, 37.77), ("img_clust_2", -122.4100001, 37.7700001),
    ]
    pts_df = points.union(
        spark.createDataFrame(extra, "image_id string, lon double, lat double")
    )
    pts = [(r["image_id"], r["lon"], r["lat"]) for r in pts_df.collect()]
    lm_rows = [(r["landmark_id"], r["lon"], r["lat"]) for r in lms.collect()]
    for k in (3, 15):  # 15 > kpad window of the k=3 case
        golden = brute_knn(pts, lm_rows, k=k)
        out = knn_join_broadcast(pts_df, lms, k=k).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r["image_id"], r["rank"])):
            got.setdefault(r["image_id"], []).append(r["landmark_id"])
        assert got == golden


def test_knn_grid_builder_exactness_invariants():
    """The grid builder must put >= kpad candidates in every cell and
    keep the searched-region bounds consistent with the ring."""
    from vtshaver_spark.operators.knn import _build_lm_grid

    rng = np.random.RandomState(7)
    lon = rng.uniform(-170, 170, size=500)
    lat = rng.uniform(-75, 75, size=500)
    kpad = 11
    grid = _build_lm_grid(lon, lat, kpad)
    assert grid is not None
    cand, sx0, sx1, sy0, sy1, meta = grid
    m = lon.size
    real = (cand < m).sum(axis=1)
    assert (real >= kpad).all()
    # the kernel's exactness guarantee: every landmark strictly inside
    # the guard-shrunk searched region of a cell IS in its candidate
    # list (so any non-candidate is at least `margin` away)
    guard = 1e-9
    for c in range(cand.shape[0]):
        members = set(cand[c][cand[c] < m].tolist())
        for i in range(m):
            if (sx0[c] + guard < lon[i] < sx1[c] - guard
                    and sy0[c] + guard < lat[i] < sy1[c] - guard):
                assert i in members, (c, i)


def test_knn_broadcast_plan_map_only(spark, points, landmarks):
    # the kNN kernel must be a shuffle-free map stage (Arrow kernel)
    plan = knn_join_broadcast(points, landmarks, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "MapInPandas" in plan
    assert "Exchange" not in plan


def test_knn_cells_recall(spark, points, landmarks):
    """Cell-candidate kNN at a coarse zoom recovers nearly all exact
    neighbors (exactness holds when the k-th neighbor is within one
    ring; the miss rate at zoom 2 on uniform data is small)."""
    exact = knn_join_broadcast(points, landmarks, k=1).collect()
    approx = knn_join_cells(points, landmarks, k=1, cell_zoom=2).collect()
    exact_map = {r["image_id"]: r["landmark_id"] for r in exact}
    approx_map = {r["image_id"]: r["landmark_id"] for r in approx}
    hits = sum(
        1 for pid, lid in approx_map.items() if exact_map.get(pid) == lid
    )
    assert len(approx_map) >= 0.95 * len(exact_map)
    assert hits >= 0.9 * len(approx_map)


def test_pip_rect_matches_numpy(spark, points):
    rects = polygons_df(spark, n=30)
    out = pip_rect_join(points, rects).select("image_id", "polygon_id").collect()
    got = {(r["image_id"], r["polygon_id"]) for r in out}
    golden = set()
    rect_rows = rects.collect()
    for p in points.collect():
        for rr in rect_rows:
            if rr["ring"] is not None:
                continue
            if (
                rr["lon_min"] <= p["lon"] < rr["lon_max"]
                and rr["lat_min"] <= p["lat"] < rr["lat_max"]
            ):
                golden.add((p["image_id"], rr["polygon_id"]))
    # the concave ring polygon is excluded from the rect join side
    got = {g for g in got if g[1] <= 30}
    assert got == golden


def test_pip_polygon_concave(spark):
    # C-shaped ring: the notch (right-middle) is outside
    ring = [
        [0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0],
        [4.0, 6.0], [10.0, 6.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0],
    ]
    pts = spark.createDataFrame(
        [
            ("in_lower", 5.0, 2.0),
            ("in_upper", 5.0, 8.0),
            ("in_left", 2.0, 5.0),
            ("notch_out", 7.0, 5.0),
            ("far_out", 20.0, 20.0),
        ],
        "image_id string, lon double, lat double",
    )
    out = pip_polygon_join(pts, [(1, ring)]).select("image_id").collect()
    assert {r["image_id"] for r in out} == {"in_lower", "in_upper", "in_left"}


def test_pip_polygon_holes(spark):
    """Multi-ring polygon: even-odd over the combined edge set — a
    point inside the hole is OUTSIDE the polygon (two crossings),
    matching the GL fill rule the within operator uses."""
    outer = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    hole = [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]]
    pts = spark.createDataFrame(
        [
            ("in_fill", 2.0, 2.0),
            ("in_hole", 5.0, 5.0),
            ("outside", 15.0, 5.0),
        ],
        "image_id string, lon double, lat double",
    )
    out = pip_polygon_join(pts, [(1, [outer, hole])]).select("image_id").collect()
    assert {r["image_id"] for r in out} == {"in_fill"}
    # single-ring spec still works (back-compat)
    out1 = pip_polygon_join(pts, [(1, outer)]).select("image_id").collect()
    assert {r["image_id"] for r in out1} == {"in_fill", "in_hole"}


def test_pip_rect_plan_is_hash_join(spark, points):
    """The cell-cover rewrite must plan a BroadcastHashJoin on the
    cell keys — the former inequality-only condition forced a
    BroadcastNestedLoopJoin whose cost is linear in the rect count."""
    rects = polygons_df(spark, n=12)
    plan = (
        pip_rect_join(points, rects)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_from_polygons_df_bridge(spark, points):
    """polygons-DataFrame -> pip_polygon_join bridge: same result as
    hand-building the driver-side list, and the size guard trips."""
    rects = polygons_df(spark, n=30)
    rect_rows = [
        (r["polygon_id"], r["lon_min"], r["lat_min"], r["lon_max"], r["lat_max"])
        for r in rects.collect()
        if r["ring"] is None
    ]
    ring_df = spark.createDataFrame(
        [(pid, ring) for pid, ring in rect_rings(rect_rows)],
        "polygon_id long, ring array<array<double>>",
    )
    via_bridge = {
        (r["image_id"], r["polygon_id"])
        for r in pip_polygon_join(points, from_polygons_df(ring_df)).collect()
    }
    direct = {
        (r["image_id"], r["polygon_id"])
        for r in pip_polygon_join(points, rect_rings(rect_rows)).collect()
    }
    assert via_bridge == direct and len(direct) > 0
    with pytest.raises(ValueError, match="max_polygons"):
        from_polygons_df(ring_df, max_polygons=2)


def test_pip_paths_agree(spark, points):
    """Rect broadcast join and the generic ray-cast kernel agree on
    rectangles (cross-validation of the two physical paths)."""
    rects = polygons_df(spark, n=12)
    rect_rows = [
        (r["polygon_id"], r["lon_min"], r["lat_min"], r["lon_max"], r["lat_max"])
        for r in rects.collect()
        if r["ring"] is None
    ]
    fast = {
        (r["image_id"], r["polygon_id"])
        for r in pip_rect_join(points, rects).select("image_id", "polygon_id").collect()
        if r["polygon_id"] <= 12
    }
    generic = {
        (r["image_id"], r["polygon_id"])
        for r in pip_polygon_join(points, rect_rings(rect_rows)).collect()
    }
    # boundary points may differ (half-open vs even-odd edge rule);
    # interiors must agree
    assert len(fast.symmetric_difference(generic)) <= 0.01 * max(len(fast), 1)


def test_caption_landmark_join(spark, landmarks):
    imgs = spark.createDataFrame(
        [
            ("i1", "a photo near landmark_7 at dusk"),
            ("i2", "a photo near landmark_17 "),
            ("i3", "no landmarks here"),
        ],
        "image_id string, caption string",
    )
    out = caption_landmark_join(imgs, landmarks).select("image_id", "landmark_id").collect()
    assert {(r["image_id"], r["landmark_id"]) for r in out} == {("i1", 7), ("i2", 17)}


def _chevrons_df(spark, n=10):
    """Concave chevron quads as a (polygon_id, rings) DataFrame plus
    the equivalent driver-side list for cross-checking."""
    rows, listing = [], []
    for k in range(n):
        cx = -170.0 + (k * 7919 % 3200) / 10.0
        cy = -75.0 + (k * 4271 % 1300) / 10.0
        w = 6.0 + (k * 131 % 70) / 10.0
        h = 8.0 + (k * 173 % 90) / 10.0
        ring = [
            [cx, cy], [cx + w, cy + h], [cx + 2.0 * w, cy],
            [cx + w, cy + 0.4 * h], [cx, cy],
        ]
        rows.append((k + 1, [ring]))
        listing.append((k + 1, ring))
    df = spark.createDataFrame(
        rows, "polygon_id long, rings array<array<array<double>>>"
    )
    return df, listing


def test_pip_cell_join_matches_generic(spark, points):
    """The cell-keyed BHJ general-polygon path (DataFrame polygon side)
    must agree with the driver-list ray-cast kernel on concave
    polygons."""
    from vtshaver_spark.operators.pip import pip_cell_join

    polys, listing = _chevrons_df(spark, n=10)
    fast = {
        (r["image_id"], r["polygon_id"])
        for r in pip_cell_join(points, polys, cell_zoom=4)
        .select("image_id", "polygon_id").collect()
    }
    generic = {
        (r["image_id"], r["polygon_id"])
        for r in pip_polygon_join(points, listing).collect()
    }
    assert fast == generic and len(fast) > 0


def test_pip_cell_join_concavity_and_holes(spark):
    """bbox-hit-but-outside (the chevron notch) must be rejected by
    the exact verify, and a hole ring must exclude interior points
    (even-odd across rings)."""
    from vtshaver_spark.operators.pip import pip_cell_join

    donut = [
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
        [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]],
    ]
    chev = [[[20.0, 0.0], [26.0, 10.0], [32.0, 0.0], [26.0, 4.0], [20.0, 0.0]]]
    polys = spark.createDataFrame(
        [(1, donut), (2, chev)],
        "polygon_id long, rings array<array<array<double>>>",
    )
    pts = spark.createDataFrame(
        [
            ("in_fill", 2.0, 2.0),        # donut fill
            ("in_hole", 5.0, 5.0),        # inside the hole -> excluded
            ("chev_wing", 22.5, 3.0),     # inside chevron left wing
            ("chev_notch", 26.0, 1.0),    # in bbox, under the notch -> out
            ("outside", 50.0, 50.0),
        ],
        "image_id string, lon double, lat double",
    )
    got = {
        (r["image_id"], r["polygon_id"])
        for r in pip_cell_join(pts, polys, cell_zoom=4)
        .select("image_id", "polygon_id").collect()
    }
    assert got == {("in_fill", 1), ("chev_wing", 2)}


def test_pip_cell_join_column_params(spark):
    """lon/lat column names are parameters, and a missing point-side
    column fails loudly up front instead of deep in the join."""
    from vtshaver_spark.operators.pip import pip_cell_join

    polys = spark.createDataFrame(
        [(1, [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
               [0.0, 0.0]]])],
        "polygon_id long, rings array<array<array<double>>>",
    )
    pts = spark.createDataFrame(
        [("a", 2.0, 2.0), ("b", 50.0, 50.0)],
        "pid string, x_deg double, y_deg double",
    )
    got = {
        r["pid"]
        for r in pip_cell_join(
            pts, polys, point_id="pid", lon_col="x_deg", lat_col="y_deg",
            cell_zoom=4,
        ).collect()
    }
    assert got == {"a"}
    with pytest.raises(ValueError, match="missing"):
        pip_cell_join(pts, polys, cell_zoom=4)  # default lon/lat absent


def test_pip_cell_join_plan_is_hash_join(spark, points):
    """Plan contract: BroadcastHashJoin on the packed single-long cell
    key (LongHashedRelation fast path), never a nested-loop join; the
    point side is map-only up to the join."""
    from vtshaver_spark.operators.pip import pip_cell_join

    polys, _ = _chevrons_df(spark, n=6)
    plan = (
        pip_cell_join(points, polys, cell_zoom=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan

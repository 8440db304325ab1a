"""'within'/'distance' geometry expressions + H3-compat cell API."""

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.functions.expr import FilterContext, filter_to_column
from vtshaver_spark.functions.h3compat import is_native_h3, with_h3_cell


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        ("in_box", 5.0, 2.0),  # lower arm of the C
        ("out_box", 15.0, 5.0),
        ("notch", 7.0, 5.0),  # inside the cut-out => outside the polygon
        ("null_geom", None, None),
    ]
    return spark.createDataFrame(
        rows, "image_id string, lon double, lat double"
    ).withColumn("props", F.create_map(F.lit("k"), F.lit("v"))).cache()


C_SHAPE = {
    "type": "Polygon",
    "coordinates": [
        [
            [0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0],
            [4.0, 6.0], [10.0, 6.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0],
        ]
    ],
}


def names(df, filt):
    col = filter_to_column(filt, FilterContext(zoom=10.0))
    return {r["image_id"] for r in df.filter(col).collect()}


def test_within_polygon(spark, pts):
    assert names(pts, ["within", C_SHAPE]) == {"in_box"}


def test_within_feature_wrapper(spark, pts):
    feature = {"type": "Feature", "geometry": C_SHAPE}
    assert names(pts, ["within", feature]) == {"in_box"}


def test_distance_expression(spark, pts):
    filt = ["<", ["distance", {"type": "Point", "coordinates": [5.0, 2.0]}], 100000]
    assert names(pts, filt) == {"in_box"}  # others are >200 km away


def test_h3_compat_cells(spark, pts):
    out = with_h3_cell(pts.filter(F.col("lon").isNotNull()), res=7)
    rows = {r["image_id"]: r["cell_h3"] for r in out.collect()}
    assert len(set(rows.values())) == 3  # all three points in distinct cells


# Published H3 test vector (Uber H3 documentation quickstart, also
# pinned in the h3-py/h3-js test suites): latLngToCell of the Uber HQ
# area point at res 5. Interop parity is only claimable when the real
# library is present; the fallback serves S2 ids and says so via
# is_native_h3().
_H3_DOC_VECTOR = (37.3615593, -122.0553238, 5, 0x85283473FFFFFFF)


@pytest.mark.skipif(
    not is_native_h3(), reason="real h3 lib absent: fallback emits S2 ids "
    "(flagged by is_native_h3()); no numeric parity claimed or claimable"
)
def test_h3_parity_published_vector(spark):
    """With the real h3 package installed, the vectorized UDF must emit
    GENUINE H3 ids — asserted against the published doc vector, so the
    compat layer interoperates with H3 indexes produced elsewhere."""
    lat, lon, res, want = _H3_DOC_VECTOR
    df = spark.createDataFrame([("p", lon, lat)], "image_id string, lon double, lat double")
    got = with_h3_cell(df, res=res).collect()[0]["cell_h3"]
    assert got == want


@pytest.mark.skipif(
    not is_native_h3(), reason="real h3 lib absent"
)
def test_h3_parity_roundtrip_sample(spark):
    """Library-present parity sweep: UDF output equals scalar
    latlng_to_cell for a deterministic global sample at several
    resolutions (catches vectorized-path drift from the scalar API)."""
    import h3 as h3lib

    from vtshaver_spark.sources.synthetic import _u

    rows = [
        (i, -180.0 + 360.0 * _u(f"h3p/{i}/lon"), -85.0 + 170.0 * _u(f"h3p/{i}/lat"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, lon double, lat double")
    for res in (3, 7, 11):
        got = {
            r["i"]: r["cell_h3"] for r in with_h3_cell(df, res=res).collect()
        }
        for i, lon, lat in rows:
            want = h3lib.latlng_to_cell(lat, lon, res)
            want_int = want if isinstance(want, int) else int(want, 16)
            assert got[i] == want_int, (i, res)


def test_h3_fallback_contract(spark):
    """Container truth: without the lib the API stays usable but emits
    S2 ids and MUST advertise that (no silent fake-H3 interop)."""
    if is_native_h3():
        pytest.skip("real h3 present")
    from vtshaver_spark.functions.s2 import s2_cell_id_np
    import numpy as np

    lat, lon, res, want_h3 = _H3_DOC_VECTOR
    df = spark.createDataFrame([("p", lon, lat)], "image_id string, lon double, lat double")
    got = with_h3_cell(df, res=res).collect()[0]["cell_h3"]
    # the fallback is the engine's S2 id at the area-equivalent level
    # (res r ~ level 2r+1) — exactly reproducible, and NOT the H3 id
    want_s2 = int(
        s2_cell_id_np(np.array([lon]), np.array([lat]), 2 * res + 1)[0]
    )
    assert got == want_s2
    assert got != want_h3
    assert is_native_h3() is False

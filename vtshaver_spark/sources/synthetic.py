"""Deterministic synthetic fixture tables (no RNG, no wall clock).

The features census reproduces the reference's canonical test tile
``sf_16_10465_25329.vector.pbf`` (7 layers — /root/reference/test/
vtshaver.test.js:55-59) as rows, with the exact per-layer feature
counts and property keys the reference's tests pin (FIXTURES.md §2):

 - poi_label 13 rows: exactly 1 maki='cafe' (test :422-437), exactly 2
   maki='toilet' (:488-522), so ["!=","maki","cafe"] keeps 12
   (:464-486); no row carries key 'cats' (:439-462); all filterrank
   values are >3 or absent so expressions.json shaves the layer
   (:615-632)
 - road 13 rows: exactly 10 with class != 'path' (:488-522); exactly 3
   LineStrings with class in {track,secondary_link,tertiary_link,
   service} and structure in {none,ford} (:649-694); at least one
   Polygon with structure none/ford + class path/pedestrian so
   expressions.json keeps the layer at z16
 - landuse 6 rows incl. feature_id 21420264 (:297-318), classes from
   {park, school, wood, cemetery, grass}
 - water 1 row, no properties (keep-all case :406-420)
 - building 5 rows (type / underground / height)
 - road_label 3 rows (never styled by expressions.json => always
   shaved, :615-632)
 - housenum_label 8 rows (minzoom-17 gating cases :569-613)

Geometry positions are laid out deterministically inside the tile's
lon/lat bounds.
"""

from __future__ import annotations

import hashlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from vtshaver_spark.functions.geo import tile_bounds

SF_TILE = (16, 10465, 25329)
HOUSENUM_TILE = (16, 10465, 25330)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.LongType(), False),
        T.StructField("y", T.LongType(), False),
        T.StructField("layer", T.StringType(), False),
        T.StructField("feature_id", T.LongType(), True),
        T.StructField("geom_type", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("wkb", T.BinaryType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("image_id", T.StringType(), True),
    ]
)


def _u(key: str) -> float:
    """Deterministic uniform [0,1) from a stable string key (md5-based;
    no Date.now/random — FIXTURES.md determinism rule)."""
    h = hashlib.md5(key.encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def _pos(tile: tuple, key: str) -> tuple:
    z, x, y = tile
    lon_min, lat_min, lon_max, lat_max = tile_bounds(z, x, y)
    u1 = _u(f"{z}/{x}/{y}/{key}/lon")
    u2 = _u(f"{z}/{x}/{y}/{key}/lat")
    return (
        lon_min + u1 * (lon_max - lon_min),
        lat_min + u2 * (lat_max - lat_min),
    )


def _rows(tile: tuple, layer: str, specs: list) -> list:
    """specs: list of (feature_id|None, geom_type, props dict)."""
    z, x, y = tile
    out = []
    for i, (fid, geom, props) in enumerate(specs):
        lon, lat = _pos(tile, f"{layer}/{i}")
        image_id = f"img_{fid:08d}" if fid is not None and layer == "poi_label" else None
        out.append((z, x, y, layer, fid, geom, lon, lat, None, props, image_id))
    return out


def sf_tile_rows() -> list:
    t = SF_TILE
    rows = []
    # poi_label — 13 features
    poi = [
        (101, "Point", {"maki": "cafe", "name": "Cafe Alpha", "name_zh": "甲咖啡", "filterrank": "5", "type": "Cafe"}),
        (102, "Point", {"maki": "toilet", "name": "Restroom N", "filterrank": "4", "type": "Toilet"}),
        (103, "Point", {"maki": "toilet", "name": "Restroom S", "filterrank": "4", "type": "Toilet"}),
        (104, "Point", {"maki": "restaurant", "name": "Diner", "name_zh": "餐厅", "filterrank": "5", "type": "Restaurant"}),
        (105, "Point", {"maki": "park", "name": "Garden Gate", "filterrank": "6", "type": "Park"}),
        (106, "Point", {"maki": "museum", "name": "History Museum", "type": "Museum"}),
        (107, "Point", {"maki": "school", "name": "Elementary", "filterrank": "4", "type": "School"}),
        (108, "Point", {"maki": "bank", "name": "Credit Union", "filterrank": "5", "type": "Bank"}),
        (109, "Point", {"maki": "bar", "name": "Taproom", "name_zh": "酒吧", "filterrank": "6", "type": "Bar"}),
        (110, "Point", {"maki": "grocery", "name": "Corner Market", "filterrank": "4", "type": "Grocery"}),
        (111, "Point", {"maki": "library", "name": "Branch Library", "type": "Library"}),
        (112, "Point", {"maki": "theatre", "name": "Playhouse", "filterrank": "5", "type": "Theatre"}),
        (None, "Point", {"maki": "monument", "name": "Obelisk", "filterrank": "6", "type": "Monument"}),
    ]
    rows += _rows(t, "poi_label", poi)
    # road — 13 features (3 path; 3 zoom-expression matches: 204/205/206)
    road = [
        (201, "LineString", {"class": "path", "structure": "none", "type": "path", "oneway": "false", "len": "120"}),
        (202, "LineString", {"class": "path", "structure": "bridge", "type": "steps", "oneway": "false", "len": "40"}),
        (203, "Polygon", {"class": "path", "structure": "none", "type": "crossing", "oneway": "false", "len": "15"}),
        (204, "LineString", {"class": "track", "structure": "none", "type": "track", "oneway": "false", "len": "300"}),
        (205, "LineString", {"class": "secondary_link", "structure": "ford", "type": "secondary_link", "oneway": "true", "len": "80"}),
        (206, "LineString", {"class": "service", "structure": "none", "type": "service", "oneway": "false", "len": "95"}),
        (207, "LineString", {"class": "service", "structure": "bridge", "type": "service", "oneway": "false", "len": "60"}),
        (208, "LineString", {"class": "primary", "structure": "none", "type": "primary", "oneway": "true", "len": "500"}),
        (209, "LineString", {"class": "secondary", "structure": "tunnel", "type": "secondary", "oneway": "false", "len": "420"}),
        (210, "LineString", {"class": "tertiary", "structure": "none", "type": "tertiary", "oneway": "false", "len": "260"}),
        (211, "LineString", {"class": "street", "structure": "none", "type": "street", "oneway": "false", "len": "180"}),
        (212, "LineString", {"class": "motorway", "structure": "bridge", "type": "motorway", "oneway": "true", "len": "900"}),
        (213, "Polygon", {"class": "track", "structure": "none", "type": "track", "oneway": "false", "len": "75"}),
    ]
    rows += _rows(t, "road", road)
    # landuse — 6 features, one pinned id for the $id filter test
    landuse = [
        (21420264, "Polygon", {"class": "park", "type": "garden"}),
        (301, "Polygon", {"class": "school", "type": "schoolyard"}),
        (302, "Polygon", {"class": "wood", "type": "forest"}),
        (303, "Polygon", {"class": "cemetery", "type": "cemetery"}),
        (304, "Polygon", {"class": "grass", "type": "meadow"}),
        (305, "Polygon", {"class": "park", "type": "playground"}),
    ]
    rows += _rows(t, "landuse", landuse)
    # water — 1 feature, no properties (keep-all layer)
    rows += _rows(t, "water", [(401, "Polygon", {})])
    # building — 5 features
    building = [
        (501, "Polygon", {"type": "building:part", "underground": "true", "height": "12"}),
        (502, "Polygon", {"type": "building:part", "underground": "false", "height": "30"}),
        (503, "Polygon", {"type": "building", "underground": "false", "height": "21"}),
        (504, "Polygon", {"type": "house", "underground": "false", "height": "8"}),
        (505, "Polygon", {"type": "garage", "underground": "true", "height": "4"}),
    ]
    rows += _rows(t, "building", building)
    # road_label — 3 features (never styled by expressions.json)
    road_label = [
        (601, "LineString", {"class": "primary", "name": "Market St", "len": "500"}),
        (602, "LineString", {"class": "street", "name": "Oak Ave", "len": "180"}),
        (603, "LineString", {"class": "motorway", "name": "US-101", "len": "900"}),
    ]
    rows += _rows(t, "road_label", road_label)
    # housenum_label — 8 features
    housenum = [
        (700 + i, "Point", {"house_num": str(n), "ref": f"r{n}", "name_zh": f"号{n}"})
        for i, n in enumerate([101, 103, 105, 200, 202, 204, 301, 303])
    ]
    rows += _rows(t, "housenum_label", housenum)
    return rows


def housenum_tile_rows() -> list:
    """The z16-housenum analogue: 7 layers dominated by housenum_label
    (/root/reference/test/propertyKeyValueFilter.test.js:61)."""
    t = HOUSENUM_TILE
    rows = []
    rows += _rows(t, "housenum_label", [
        (1000 + i, "Point", {"house_num": str(i), "ref": f"hr{i}", "name_zh": f"门{i}"})
        for i in range(40)
    ])
    rows += _rows(t, "poi_label", [
        (1101, "Point", {"maki": "cafe", "name": "Cafe Beta", "filterrank": "5", "type": "Cafe"}),
        (1102, "Point", {"maki": "toilet", "name": "WC", "filterrank": "4", "type": "Toilet"}),
    ])
    rows += _rows(t, "road", [
        (1201, "LineString", {"class": "street", "structure": "none", "type": "street", "oneway": "false", "len": "100"}),
        (1202, "LineString", {"class": "path", "structure": "none", "type": "path", "oneway": "false", "len": "55"}),
    ])
    rows += _rows(t, "landuse", [(1301, "Polygon", {"class": "park", "type": "garden"})])
    rows += _rows(t, "water", [(1401, "Polygon", {})])
    rows += _rows(t, "building", [(1501, "Polygon", {"type": "building", "underground": "false", "height": "10"})])
    rows += _rows(t, "road_label", [(1601, "LineString", {"class": "street", "name": "Pine St", "len": "100"})])
    return rows


def value_types_tile_rows() -> list:
    """mvt-fixtures analogue: one layer exercising every MVT value type
    as canonical strings plus a Point/LineString mix for geometry-type
    filters (/root/reference/test/mvtfixtures.test.js:16-81)."""
    t = (0, 0, 0)
    specs = [
        (1, "Point", {
            "string_value": "ello",
            "bool_value": "true",
            "int_value": "6",
            "double_value": "1.23",
            "float_value": "3.1",
            "sint_value": "-87948",
            "uint_value": "87948",
        }),
        (2, "LineString", {"highway": "primary"}),
        (3, "Unknown", {"ghost": "yes"}),
    ]
    return _rows(t, "hello", specs)


def features_df(spark: SparkSession, extra_rows: Optional[list] = None) -> DataFrame:
    rows = sf_tile_rows() + housenum_tile_rows() + value_types_tile_rows()
    if extra_rows:
        rows += extra_rows
    return spark.createDataFrame(rows, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Graft-side tables: landmarks + polygons (FIXTURES.md §4-5)
# ---------------------------------------------------------------------------

LANDMARKS_SCHEMA = T.StructType(
    [
        T.StructField("landmark_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.LongType(), False),
        T.StructField("layer", T.StringType(), False),
        T.StructField("lon_min", T.DoubleType(), False),
        T.StructField("lat_min", T.DoubleType(), False),
        T.StructField("lon_max", T.DoubleType(), False),
        T.StructField("lat_max", T.DoubleType(), False),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType())), True),
        T.StructField("minzoom", T.DoubleType(), False),
        T.StructField("maxzoom", T.DoubleType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), False),
    ]
)


def landmarks_df(spark: SparkSession, n: int = 200) -> DataFrame:
    makis = ["cafe", "toilet", "park", "museum", "bank", "school"]
    classes = ["park", "school", "wood", "cemetery", "grass"]
    rows = []
    for i in range(1, n + 1):
        lon = -180.0 + 360.0 * _u(f"landmark/{i}/lon")
        lat = -85.0 + 170.0 * _u(f"landmark/{i}/lat")
        rows.append(
            (
                i,
                f"landmark_{i}",
                lon,
                lat,
                {"maki": makis[i % len(makis)], "class": classes[i % len(classes)]},
            )
        )
    return spark.createDataFrame(rows, LANDMARKS_SCHEMA)


def polygons_df(spark: SparkSession, n: int = 50) -> DataFrame:
    """Axis-aligned seeded rectangles plus one concave ring (a notch),
    for point-in-polygon goldens (FIXTURES.md §5)."""
    classes = ["landuse", "water", "building"]
    rows = []
    for i in range(1, n + 1):
        cx = -180.0 + 360.0 * _u(f"poly/{i}/cx")
        cy = -80.0 + 160.0 * _u(f"poly/{i}/cy")
        w = 2.0 + 10.0 * _u(f"poly/{i}/w")
        h = 2.0 + 10.0 * _u(f"poly/{i}/h")
        rows.append(
            (
                i,
                classes[i % 3],
                cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                None,
                0.0,
                22.0,
                {"class": "park" if i % 2 == 0 else "wood"},
            )
        )
    # one concave polygon: a C-shape (rect with a notch cut from the right)
    rows.append(
        (
            n + 1,
            "landuse",
            0.0, 0.0, 10.0, 10.0,
            [
                [0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0],
                [4.0, 6.0], [10.0, 6.0], [10.0, 10.0], [0.0, 10.0],
                [0.0, 0.0],
            ],
            0.0,
            22.0,
            {"class": "park"},
        )
    )
    return spark.createDataFrame(rows, POLYGONS_SCHEMA)

"""Full-geometry GL ``["within", geojson]`` — the scale path.

mbgl (which the reference delegates filter evaluation to,
/root/reference/src/filters.cpp:108-121) evaluates ``within`` over the
WHOLE feature geometry, not a representative point:

- Point / MultiPoint features: within iff EVERY point is inside the
  polygon fill (even-odd, holes excluded);
- LineString / MultiLineString: additionally NO segment may properly
  cross a polygon boundary edge (a line with both endpoints inside
  that clips a hole corner is NOT within);
- Polygon features: always false (the GL spec scopes ``within`` to
  point and line layers).

The Spark-native formulation works on vertex rows — one row per
decoded geometry vertex, exactly what ``sources.mvt.decode_tile_points``
emits — so the whole evaluation is relational:

1. per-vertex inside flag and per-segment crossing flag are LITERAL
   unrolled Column math (functions/geo.point_in_polygon_col /
   segment_crosses_col): whole-stage codegen, no UDF, no interpreted
   higher-order lambdas;
2. segments come from ``lead()`` over a window partitioned by the
   FEATURE key (ordered by path_idx, vertex_idx, masked at path
   boundaries) — NOT by (feature, path) — so the grouped reduction in
   step 3 clusters on the same key and Catalyst plans ONE shuffle for
   window + aggregate;
3. one ``groupBy(feature key)`` with bool_and/bool_or map-side
   partials reduces flags to the per-feature verdict.

At 100 TB the vertex table is the largest relation in the job; this
plan touches it with one hash shuffle keyed by feature id (uniformly
distributed — tile-local feature ids), everything else map-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vtshaver_spark.functions.geo import (
    point_in_polygon_col,
    segment_crosses_col,
)


def feature_within(
    vertex_df: DataFrame,
    geom: dict,
    keys: Sequence[str] = ("z", "x", "y", "layer", "feature_id"),
    geom_type_col: str = "geom_type",
    path_col: str = "path_idx",
    vertex_col: str = "vertex_idx",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Reduce vertex rows to one ``within: boolean`` row per feature.

    ``vertex_df`` needs one row per geometry vertex carrying ``keys``,
    the geometry type, a path index (ring/part; pass ``None`` for
    single-path data), a vertex order column, and lon/lat.
    """
    keys = [k for k in keys if k in vertex_df.columns]
    order = [path_col, vertex_col] if path_col and path_col in vertex_df.columns else [vertex_col]
    w = Window.partitionBy(*keys).orderBy(*order)

    lon_c, lat_c = F.col(lon), F.col(lat)
    nlon, nlat = F.lead(lon).over(w), F.lead(lat).over(w)
    # a segment exists only toward the next vertex of the SAME path
    same_path = (
        (F.lead(path_col).over(w) == F.col(path_col))
        if path_col and path_col in vertex_df.columns
        else F.lit(True)
    )
    seg_cross = F.when(
        nlon.isNotNull() & same_path,
        segment_crosses_col(lon_c, lat_c, nlon, nlat, geom),
    ).otherwise(F.lit(False))

    flags = vertex_df.withColumn(
        "_in", point_in_polygon_col(lon_c, lat_c, geom)
    ).withColumn("_cross", seg_cross)

    agg = flags.groupBy(*keys, geom_type_col).agg(
        F.bool_and("_in").alias("_all_in"),
        F.bool_or("_cross").alias("_any_cross"),
    )
    verdict = (
        F.when(F.col(geom_type_col) == "Point", F.col("_all_in"))
        .when(
            F.col(geom_type_col) == "LineString",
            F.col("_all_in") & ~F.col("_any_cross"),
        )
        .otherwise(F.lit(False))
    )
    return agg.select(*keys, geom_type_col, verdict.alias("within"))


def shave_within(
    features_df: DataFrame,
    vertex_df: DataFrame,
    geom: dict,
    keys: Sequence[str] = ("z", "x", "y", "layer", "feature_id"),
) -> DataFrame:
    """Keep only features whose full geometry is within the polygon —
    a left-semi join of the feature rows against the per-feature
    verdicts (the same layer-semi-join shape shave() uses, O12)."""
    keys = [k for k in keys if k in features_df.columns]
    verdicts = feature_within(vertex_df, geom, keys=keys)
    return features_df.join(
        verdicts.filter(F.col("within")).select(*keys), on=keys, how="left_semi"
    )

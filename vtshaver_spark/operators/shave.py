"""The shave pipeline: layer semi-join + zoom gate + feature filter +
property projection, as one Catalyst plan.

Semantics parity with the reference worker loop
(/root/reference/src/shave.cpp:237-301):

 - layers absent from the compiled style are dropped (O12);
 - a layer is kept only when query zoom is inside [minzoom, maxzoom]
   OR the overzoom rule fires: a provided tileset maxzoom is below the
   style minzoom (O13, src/shave.cpp:275-276);
 - keep-all layers (filter True + properties True) pass through
   verbatim — including Unknown-geometry rows (O14 fast path,
   src/shave.cpp:279-281);
 - on the filtered path, Unknown geometries are always dropped (O15,
   src/shave.cpp:196-200) and the compiled GL predicate runs per row
   at the query zoom (O16);
 - surviving rows' properties are pruned to the per-layer allowlist
   (O17, src/shave.cpp:184-193).

Spark-first design: the whole thing is a single ``filter`` +
``withColumn`` pair over the features DataFrame — an OR-of-layers
predicate plus a CASE-of-layers map projection. No shuffle, no UDFs;
the style table is folded into the plan as literals (it is tiny), so
Catalyst constant-folds keep-all branches and pushes the layer/zoom
conjuncts down to the scan. Scale note: at 10^12 rows this remains a
map-only stage; with z/layer as partition columns of the source table
the layer+zoom conjuncts become partition pruning.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vtshaver_spark.errors import ShaveError
from vtshaver_spark import errors as E
from vtshaver_spark.functions.expr import FilterContext, filter_to_column
from vtshaver_spark.style.filters import Filters, LayerFilter

_GEOM_TYPES = ("Point", "LineString", "Polygon")


def _layer_zoom_pred(
    lf: LayerFilter, zoom: Column, maxzoom: Optional[float]
) -> Column:
    in_range = (zoom >= F.lit(lf.minzoom)) & (zoom <= F.lit(lf.maxzoom))
    if maxzoom is not None:
        return in_range | F.lit(float(maxzoom) < lf.minzoom)
    return in_range


def compile_shave_columns(
    filters: Filters,
    zoom: Union[float, Column, None] = None,
    maxzoom: Optional[float] = None,
    layer_col: str = "layer",
    props_col: str = "props",
    geom_type_col: str = "geom_type",
    feature_id_col: str = "feature_id",
    within_resolver=None,
    distance_resolver=None,
) -> tuple:
    """Compile a style into (keep predicate, projected-props Column).

    Shared by ``shave`` (filter + withColumn) and
    ``shave_with_metrics`` (ONE conditional aggregation over both) —
    the compile happens once, the data is scanned once either way.
    """
    if not isinstance(filters, Filters):
        raise ShaveError(
            "filters option must be a shaver.Filters object"
        )
    if isinstance(zoom, (int, float)) and not isinstance(zoom, bool):
        if zoom < 0:
            raise ShaveError(E.MSG_ZOOM_TYPE)
        zoom_col: Column = F.lit(float(zoom))
    elif isinstance(zoom, Column):
        zoom_col = zoom
    elif zoom is None:
        zoom_col = F.col("z").cast("double")
    else:
        raise ShaveError(E.MSG_ZOOM_TYPE)
    if maxzoom is not None and (
        not isinstance(maxzoom, (int, float)) or isinstance(maxzoom, bool) or maxzoom < 0
    ):
        raise ShaveError(E.MSG_MAXZOOM_TYPE)

    ctx = FilterContext(
        props=props_col,
        geom_type=geom_type_col,
        feature_id=feature_id_col,
        zoom=zoom_col,
        within_resolver=within_resolver,
        distance_resolver=distance_resolver,
    )
    layer = F.col(layer_col)

    # OR-of-layers row predicate (inlined broadcast semi-join).
    keep: Optional[Column] = None
    for lf in filters:
        branch = (layer == F.lit(lf.layer)) & _layer_zoom_pred(
            lf, zoom_col, maxzoom
        )
        if lf.keep_all_filter and lf.keep_all_properties:
            # O14 fast path: verbatim copy — Unknown geometries survive.
            pass
        else:
            feature_pred = filter_to_column(lf.filter, ctx)
            branch = (
                branch
                & F.col(geom_type_col).isin(*_GEOM_TYPES)
                & feature_pred
            )
        keep = branch if keep is None else (keep | branch)
    if keep is None:
        keep = F.lit(False)  # empty style shaves everything

    # CASE-of-layers property projection (O17). Keep-all layers fall
    # through to the identity branch.
    proj: Optional[Column] = None
    props = F.col(props_col)
    for lf in filters:
        if lf.keep_all_properties:
            continue
        if lf.properties:
            allow = F.array([F.lit(k) for k in lf.properties])
            pruned = F.map_filter(props, lambda k, _v: F.array_contains(allow, k))
        else:
            # empty allowlist (styled but no property references): all
            # feature properties are stripped
            pruned = F.map_filter(props, lambda _k, _v: F.lit(False))
        cond = layer == F.lit(lf.layer)
        proj = F.when(cond, pruned) if proj is None else proj.when(cond, pruned)
    projected = proj.otherwise(props) if proj is not None else props
    return keep, projected


def shave(
    df: DataFrame,
    filters: Filters,
    zoom: Union[float, Column, None] = None,
    maxzoom: Optional[float] = None,
    layer_col: str = "layer",
    props_col: str = "props",
    geom_type_col: str = "geom_type",
    feature_id_col: str = "feature_id",
    vertex_df: Optional[DataFrame] = None,
    within_keys=("z", "x", "y", "layer", "feature_id"),
) -> DataFrame:
    """Shave a features DataFrame with a compiled style.

    ``zoom`` may be a number (whole-job binding, reference parity), a
    Column (per-row, e.g. ``F.col("z")`` to shave every zoom level in
    one pass — the scale path), or None (defaults to ``F.col("z")``).
    ``maxzoom`` is the *tileset* maxzoom for the overzoom rule.

    ``vertex_df``: pass the per-vertex table (one row per decoded
    geometry vertex, the ``sources.mvt.decode_tile_points`` shape) to
    evaluate any ``["within", geojson]`` in the style's filters over
    the FULL feature geometry — mbgl semantics, which the reference
    inherits (/root/reference/src/filters.cpp:108-121): every vertex
    inside AND no segment properly crossing the polygon boundary.
    Without it, ``within`` falls back to the row-level point form
    (documented in functions/expr._op_within). All distinct within
    geometries share ONE window+aggregate pass over the vertex table
    and ONE equi-join on ``within_keys`` — two keyed shuffles total
    at any style complexity; features with no vertex rows count as
    not-within.
    """
    aug, keep, projected, flag_cols = _compile_with_geometry(
        df, filters, zoom, maxzoom, layer_col, props_col, geom_type_col,
        feature_id_col, vertex_df, within_keys,
    )
    return aug.filter(keep).withColumn(props_col, projected).drop(*flag_cols)


def _compile_with_geometry(
    df: DataFrame,
    filters: Filters,
    zoom,
    maxzoom,
    layer_col: str,
    props_col: str,
    geom_type_col: str,
    feature_id_col: str,
    vertex_df: Optional[DataFrame],
    within_keys,
) -> tuple:
    """Compile (keep, projected) and, when the style contains
    ``["within"]`` / ``["distance"]`` and a vertex table is supplied,
    bind each distinct geometry's per-feature verdict (boolean) /
    min-vertex-distance (meters) as a joined column.

    Returns (augmented df, keep, projected, bound columns to drop).
    All distinct geometries — within polygons AND distance points —
    share ONE window+aggregate pass over the vertex table and ONE
    equi-join: two keyed shuffles total at any style complexity.
    Features with no vertex rows count as not-within, and their
    distances stay NULL (every comparison on them is false — GL
    absent-geometry semantics).
    """
    if vertex_df is None:
        keep, projected = compile_shave_columns(
            filters, zoom, maxzoom, layer_col, props_col, geom_type_col,
            feature_id_col,
        )
        return df, keep, projected, []

    from vtshaver_spark.operators.within import feature_within_multi

    geoms: list = []
    points: list = []

    def resolver(geom: dict) -> Column:
        for i, g in enumerate(geoms):
            if g == geom:
                return F.col(f"_within_{i}")
        geoms.append(geom)
        return F.col(f"_within_{len(geoms) - 1}")

    def dist_resolver(plon: float, plat: float) -> Column:
        for j, p in enumerate(points):
            if p == (plon, plat):
                return F.col(f"_dist_{j}")
        points.append((plon, plat))
        return F.col(f"_dist_{len(points) - 1}")

    keep, projected = compile_shave_columns(
        filters, zoom, maxzoom, layer_col, props_col, geom_type_col,
        feature_id_col, within_resolver=resolver,
        distance_resolver=dist_resolver,
    )
    if not geoms and not points:
        return df, keep, projected, []

    keys = [k for k in within_keys if k in df.columns and k in vertex_df.columns]
    flag_cols = [f"_within_{i}" for i in range(len(geoms))]
    dist_cols = [f"_dist_{j}" for j in range(len(points))]
    verdicts = feature_within_multi(
        vertex_df, geoms, keys=keys, geom_type_col=geom_type_col,
        out_cols=flag_cols, distance_points=points, distance_cols=dist_cols,
    ).select(*keys, *flag_cols, *dist_cols)
    aug = df.join(verdicts, on=keys, how="left")
    for c in flag_cols:
        aug = aug.withColumn(c, F.coalesce(F.col(c), F.lit(False)))
    return aug, keep, projected, flag_cols + dist_cols


def shave_with_metrics(
    df: DataFrame,
    filters: Filters,
    zoom: Union[float, Column, None] = None,
    maxzoom: Optional[float] = None,
    vertex_df: Optional[DataFrame] = None,
    within_keys=("z", "x", "y", "layer", "feature_id"),
    **kwargs,
) -> tuple:
    """Shave plus a per-tile metrics DataFrame (the vtshave CLI
    contract, /root/reference/bin/vtshave.js:75-93: before/after sizes).

    Single-pass metrics: before/after feature counts and property
    bytes come from ONE conditional aggregation over the input — no
    second scan, no join (at 10^12 rows a re-scan is real money).

    ``vertex_df``: same full-geometry ``["within"]`` routing as
    ``shave`` — when supplied, the metrics aggregation runs over the
    verdict-augmented rows, so before/after counts reflect whole-
    geometry semantics too.
    """
    props_col = kwargs.get("props_col", "props")
    df, keep, projected, flag_cols = _compile_with_geometry(
        df, filters, zoom, maxzoom,
        kwargs.get("layer_col", "layer"), props_col,
        kwargs.get("geom_type_col", "geom_type"),
        kwargs.get("feature_id_col", "feature_id"),
        vertex_df, within_keys,
    )
    shaved = df.filter(keep).withColumn(props_col, projected).drop(*flag_cols)

    # Approximate encoded size of a row: sum of key/value lengths of its
    # retained properties (a stable stand-in for MVT bytes in row-model).
    # length(concat(keys)) + length(concat(values)) — stays in codegen;
    # the former per-entry aggregate() fold ran interpreted on the full
    # input, the hottest path the metrics job has.
    def prop_bytes(col: Column) -> Column:
        return F.coalesce(
            F.length(F.concat_ws("", F.map_keys(col)))
            + F.length(F.concat_ws("", F.map_values(col))),
            F.lit(0),
        )

    metrics = (
        df.groupBy("z", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("features_before"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("features_after"),
            F.sum(prop_bytes(F.col(props_col))).alias("prop_bytes_before"),
            F.sum(
                F.when(keep, prop_bytes(projected)).otherwise(0)
            ).alias("prop_bytes_after"),
        )
        .withColumn(
            "shave_ratio",
            F.when(
                F.col("prop_bytes_before") > 0,
                1.0 - F.col("prop_bytes_after") / F.col("prop_bytes_before"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return shaved, metrics


def tile_layer_summary(shaved: DataFrame) -> DataFrame:
    """Per (tile, layer) survivor census — the row-set form the
    reference's tests assert on (layer names + feature counts +
    property key sets, test/vtshaver.test.js:13-26)."""
    return (
        shaved.groupBy("z", "x", "y", "layer")
        .agg(
            F.count(F.lit(1)).alias("feature_count"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.map_keys(F.col("props")))))
            ).alias("property_keys"),
        )
        .orderBy("z", "x", "y", "layer")
    )

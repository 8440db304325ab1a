"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator (SURVEY.md §2) over
the derived corpus views (vtshaver_spark/sources/views.py — identical
SQL on the Spark and DuckDB sides), and ``oracle_sql()`` re-states the
expected result in portable SQL. Non-SQL-expressible ops (MinHash-LSH,
SimHash, SRP-LSH ANN) ship without oracles (rows-only check) and are
golden-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vtshaver_spark import Filters, style_to_filters
from vtshaver_spark.functions import geo
from vtshaver_spark.functions.text import (
    lang_guess,
    token_count,
)
from vtshaver_spark.operators.ann import cosine_topk, lsh_cosine_topk
from vtshaver_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash_near_dups,
)
from vtshaver_spark.operators.knn import caption_landmark_join, knn_join_broadcast
from vtshaver_spark.operators.pip import pip_rect_join
from vtshaver_spark.operators.shave import shave
from vtshaver_spark.sources.views import (
    DERIVED_VIEWS,
    FEATURES_SQL,
    IMAGES_SQL,
    LANDMARKS_SQL,
    POLYGONS_SQL,
    features_with_props,
    register_views,
)

GEOM_OK = "geom_type IN ('Point', 'LineString', 'Polygon')"


# ---------------------------------------------------------------------------
# Styles used by the shave queries
# ---------------------------------------------------------------------------

CAFE_STYLE = {
    "layers": [
        {
            "source-layer": "poi_label",
            "filter": ["==", "maki", "cafe"],
            "paint": {"icon-image": "{maki}"},
        }
    ]
}

NEGATION_STYLE = {
    "layers": [
        {"source-layer": "poi_label", "filter": ["!=", "maki", "cafe"]}
    ]
}

MEMBERSHIP_STYLE = {
    "layers": [
        {"source-layer": "road", "filter": ["in", "class", "track", "service", "primary"]},
        {"source-layer": "landuse", "filter": ["!in", "class", "park", "wood"]},
    ]
}

ZOOM_STYLE = {
    "layers": [
        {"source-layer": "poi_label", "minzoom": 14, "maxzoom": 22},
        {"source-layer": "housenum_label", "minzoom": 17},
        {"source-layer": "road", "minzoom": 0, "maxzoom": 15},
    ]
}

EXPRESSION_ROAD_STYLE = {
    "layers": [
        {
            "source-layer": "road",
            "minzoom": 13,
            "filter": [
                "all",
                [
                    "step",
                    ["zoom"],
                    ["==", ["get", "class"], "track"],
                    14,
                    [
                        "match",
                        ["get", "class"],
                        ["track", "secondary_link", "tertiary_link", "service"],
                        True,
                        False,
                    ],
                ],
                ["match", ["get", "structure"], ["none", "ford"], True, False],
                ["==", ["geometry-type"], "LineString"],
            ],
        }
    ]
}

MATCH_LANDUSE_STYLE = {
    "layers": [
        {
            "source-layer": "landuse",
            "filter": [
                "match",
                ["get", "class"],
                ["airport", "cemetery", "hospital", "park", "pitch", "sand", "school"],
                True,
                False,
            ],
        }
    ]
}

PROJECTION_STYLE = {
    "layers": [
        {
            "source-layer": "road",
            "paint": {"a": "{type}", "b": "{structure}", "c": "{oneway}"},
        },
        {
            "source-layer": "poi_label",
            "paint": {"a": "{maki}", "b": "{filterrank}"},
        },
    ]
}


def _shave_query(style: dict, zoom: float, maxzoom, out_cols):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        df = features_with_props(spark)
        filters = Filters(style_to_filters(style))
        return shave(df, filters, zoom=zoom, maxzoom=maxzoom).select(*out_cols)

    return run


def _oracle(body: str) -> str:
    """Wrap an oracle body with the derived views as CTEs (identical
    SQL text to what the Spark side registered)."""
    ctes = ",\n".join(f"{name} AS ({sql})" for name, sql in DERIVED_VIEWS.items())
    return f"WITH {ctes}\n{body}"


# ---------------------------------------------------------------------------
# Driver entry points
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: shave the derived feature corpus with the zoom-stepped
    road expression style and summarize survivors per tile."""
    register_views(spark, "/root/testdata/sf0.001")
    df = features_with_props(spark)
    filters = Filters(style_to_filters(EXPRESSION_ROAD_STYLE))
    shaved = shave(df, filters, zoom=16, maxzoom=16)
    return (
        shaved.groupBy("z", "x", "y", "layer")
        .agg(
            F.count(F.lit(1)).alias("feature_count"),
            F.countDistinct("class").alias("n_classes"),
        )
        .orderBy("z", "x", "y", "layer")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- shave pipeline (O1-O19) -----------------------------------------
    q["shave_cafe"] = _shave_query(
        CAFE_STYLE, 16, 16,
        [
            F.col("feature_id"),
            F.col("layer"),
            F.col("props")["maki"].alias("maki"),
        ],
    )
    q["shave_negation"] = _shave_query(
        NEGATION_STYLE, 16, 16,
        [F.col("feature_id"), F.col("maki")],
    )
    q["shave_membership"] = _shave_query(
        MEMBERSHIP_STYLE, 16, 16,
        [F.col("feature_id"), F.col("layer"), F.col("class")],
    )
    q["shave_zoom_overzoom"] = _shave_query(
        ZOOM_STYLE, 16, 16,
        [F.col("feature_id"), F.col("layer")],
    )
    q["shave_expression_roads"] = _shave_query(
        EXPRESSION_ROAD_STYLE, 16, 16,
        [F.col("feature_id"), F.col("class"), F.col("structure")],
    )
    q["shave_match_landuse"] = _shave_query(
        MATCH_LANDUSE_STYLE, 16, 16,
        [F.col("feature_id"), F.col("class")],
    )
    q["shave_property_projection"] = _shave_query(
        PROJECTION_STYLE, 16, 16,
        [
            F.col("feature_id"),
            F.col("layer"),
            F.array_join(F.array_sort(F.map_keys(F.col("props"))), ",").alias(
                "kept_keys"
            ),
        ],
    )

    # --- tiling / cells (G1, G2, G7) -------------------------------------
    def tile_assign(spark, sf_dir):
        register_views(spark, sf_dir)
        return geo.with_tile(spark.table("images_v"), z=5).select(
            "image_id", "z", "x", "y"
        )

    q["tile_assign_z5"] = tile_assign

    def tile_counts(spark, sf_dir):
        register_views(spark, sf_dir)
        df = geo.with_tile(spark.table("images_v"), z=7)
        return df.groupBy("z", "x", "y").agg(
            F.count(F.lit(1)).alias("n_images"),
            F.countDistinct("caption_landmark_id").alias("n_landmarks"),
        )

    q["tile_counts_z7"] = tile_counts

    def tile_cells(spark, sf_dir):
        register_views(spark, sf_dir)
        df = geo.with_tile(spark.table("images_v"), z=6)
        return df.select(
            "image_id",
            geo.tile_cell("z", "x", "y").alias("cell"),
            geo.quadkey(6, "x", "y").alias("qk"),
        )

    q["tile_cell_ids"] = tile_cells

    # --- spatial joins (G3, G4) ------------------------------------------
    def knn(spark, sf_dir):
        register_views(spark, sf_dir)
        pts = spark.table("images_v").filter(F.col("k") % 97 == 0)
        lms = spark.table("landmarks_v")
        out = knn_join_broadcast(pts, lms, k=3, metric="sqdeg")
        return out.select(
            "image_id",
            "rank",
            "landmark_id",
            F.round(F.col("dist"), 9).alias("dist2"),
        )

    q["knn_landmarks_k3"] = knn

    def pip(spark, sf_dir):
        register_views(spark, sf_dir)
        pts = spark.table("images_v").filter(F.col("k") % 23 == 0)
        return pip_rect_join(pts, spark.table("polygons_v")).select(
            "image_id", "polygon_id"
        )

    q["pip_rect"] = pip

    def caption_join(spark, sf_dir):
        register_views(spark, sf_dir)
        imgs = spark.table("images_v").filter(F.col("k") % 53 == 0)
        return caption_landmark_join(imgs, spark.table("landmarks_v")).select(
            "image_id", "landmark_id"
        )

    q["caption_landmark_join"] = caption_join

    # --- dedup / text (training-data ops) --------------------------------
    def dedup_exact_q(spark, sf_dir):
        register_views(spark, sf_dir)
        return (
            spark.table("documents")
            .groupBy(F.md5("text").alias("content_md5"))
            .agg(
                F.min("doc_id").alias("keeper_id"),
                F.count(F.lit(1)).alias("group_size"),
            )
        )

    q["dedup_exact"] = dedup_exact_q

    def token_stats(spark, sf_dir):
        register_views(spark, sf_dir)
        d = spark.table("documents")
        return d.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("alpha_chars"),
            F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).alias(
                "punct_chars"
            ),
        )

    q["token_stats"] = token_stats

    def lang_rollup(spark, sf_dir):
        register_views(spark, sf_dir)
        return (
            spark.table("documents")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
            )
        )

    q["lang_rollup"] = lang_rollup

    def lang_id_guess(spark, sf_dir):
        # heuristic language ID — no SQL oracle (rows-only check);
        # golden-tested in tests/test_text.py
        register_views(spark, sf_dir)
        return spark.table("documents").select(
            "doc_id", lang_guess(F.col("text")).alias("lang_guess")
        )

    q["lang_id_guess"] = lang_id_guess

    # --- similarity search (ANN) -----------------------------------------
    def ann_exact(spark, sf_dir):
        register_views(spark, sf_dir)
        emb = spark.table("embeddings")
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = cosine_topk(emb.filter(F.col("vec_id") >= 5), queries_df, k=5)
        return out.select(
            "query_id", "rank", "vec_id", F.round(F.col("cos"), 6).alias("cos_r")
        )

    q["ann_cosine_top5"] = ann_exact

    def ann_lsh(spark, sf_dir):
        # approximate ANN (SRP-LSH + multiprobe) — rows-only check;
        # recall vs exact is golden-tested in tests/test_ann.py
        register_views(spark, sf_dir)
        emb = spark.table("embeddings")
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = lsh_cosine_topk(emb.filter(F.col("vec_id") >= 5), queries_df, k=5)
        return out.select(
            "query_id", "rank", "vec_id", F.round(F.col("cos"), 6).alias("cos_r")
        )

    q["ann_lsh_top5"] = ann_lsh

    def minhash_near_dup(spark, sf_dir):
        # MinHash-LSH candidates + exact Jaccard verify — rows-only
        register_views(spark, sf_dir)
        d = spark.table("documents")
        cands = minhash_lsh_candidates(d, num_hashes=32, bands=8)
        return (
            ngram_jaccard(d, cands)
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r"))
        )

    q["minhash_near_dups"] = minhash_near_dup

    def simhash_pairs(spark, sf_dir):
        # SimHash near-dup pairs — rows-only
        register_views(spark, sf_dir)
        return simhash_near_dups(
            spark.table("documents"), max_hamming=6, blocks=4
        ).select("doc_a", "doc_b", "hamming")

    q["simhash_near_dups"] = simhash_pairs

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["shave_cafe"] = _oracle(f"""
SELECT feature_id, layer, maki
FROM features_v
WHERE layer = 'poi_label' AND maki = 'cafe' AND {GEOM_OK}
""")

    o["shave_negation"] = _oracle(f"""
SELECT feature_id, maki
FROM features_v
WHERE layer = 'poi_label' AND {GEOM_OK}
  AND (maki IS NULL OR maki <> 'cafe')
""")

    o["shave_membership"] = _oracle(f"""
SELECT feature_id, layer, class
FROM features_v
WHERE {GEOM_OK} AND (
      (layer = 'road' AND class IN ('track', 'service', 'primary'))
   OR (layer = 'landuse' AND (class IS NULL OR class NOT IN ('park', 'wood')))
)
""")

    o["shave_zoom_overzoom"] = _oracle(f"""
SELECT feature_id, layer
FROM features_v
WHERE layer IN ('poi_label', 'housenum_label') AND {GEOM_OK}
""")

    o["shave_expression_roads"] = _oracle(f"""
SELECT feature_id, class, structure
FROM features_v
WHERE layer = 'road' AND geom_type = 'LineString'
  AND class IN ('track', 'secondary_link', 'tertiary_link', 'service')
  AND structure IN ('none', 'ford')
""")

    o["shave_match_landuse"] = _oracle(f"""
SELECT feature_id, class
FROM features_v
WHERE layer = 'landuse' AND {GEOM_OK}
  AND class IN ('airport', 'cemetery', 'hospital', 'park', 'pitch', 'sand', 'school')
""")

    o["shave_property_projection"] = _oracle(f"""
SELECT feature_id, layer,
  CASE WHEN layer = 'road' THEN CONCAT_WS(',',
         CASE WHEN oneway IS NOT NULL THEN 'oneway' END,
         CASE WHEN structure IS NOT NULL THEN 'structure' END,
         CASE WHEN type IS NOT NULL THEN 'type' END)
       ELSE CONCAT_WS(',',
         CASE WHEN filterrank IS NOT NULL THEN 'filterrank' END,
         CASE WHEN maki IS NOT NULL THEN 'maki' END)
  END AS kept_keys
FROM features_v
WHERE layer IN ('road', 'poi_label') AND {GEOM_OK}
""")

    tx5 = geo.tile_x_sql("lon", 5)
    ty5 = geo.tile_y_sql("lat", 5)
    o["tile_assign_z5"] = _oracle(f"""
SELECT image_id, CAST(5 AS INT) AS z, {tx5} AS x, {ty5} AS y
FROM images_v
""")

    tx7 = geo.tile_x_sql("lon", 7)
    ty7 = geo.tile_y_sql("lat", 7)
    o["tile_counts_z7"] = _oracle(f"""
SELECT CAST(7 AS INT) AS z, {tx7} AS x, {ty7} AS y,
       COUNT(*) AS n_images,
       COUNT(DISTINCT caption_landmark_id) AS n_landmarks
FROM images_v
GROUP BY 1, 2, 3
""")

    tx6 = geo.tile_x_sql("lon", 6)
    ty6 = geo.tile_y_sql("lat", 6)
    qk_terms = " + ".join(
        f"(((x >> {i}) & 1) + 2 * ((y >> {i}) & 1)) * {1 << (2 * i)}"
        for i in range(6)
    )
    o["tile_cell_ids"] = _oracle(f"""
SELECT image_id,
       CAST(6 AS BIGINT) * {1 << 58} + x * {1 << 29} + y AS cell,
       CAST({qk_terms} AS BIGINT) AS qk
FROM (SELECT image_id, {tx6} AS x, {ty6} AS y FROM images_v) t
""")

    o["knn_landmarks_k3"] = _oracle("""
SELECT image_id, rank, landmark_id, ROUND(dist2, 9) AS dist2
FROM (
  SELECT i.image_id, l.landmark_id,
         (i.lon - l.lon) * (i.lon - l.lon) + (i.lat - l.lat) * (i.lat - l.lat) AS dist2,
         ROW_NUMBER() OVER (
           PARTITION BY i.image_id
           ORDER BY (i.lon - l.lon) * (i.lon - l.lon) + (i.lat - l.lat) * (i.lat - l.lat) ASC,
                    l.landmark_id ASC
         ) AS rank
  FROM (SELECT * FROM images_v WHERE k % 97 = 0) i
  CROSS JOIN landmarks_v l
) ranked
WHERE rank <= 3
""")

    o["pip_rect"] = _oracle("""
SELECT i.image_id, p.polygon_id
FROM (SELECT * FROM images_v WHERE k % 23 = 0) i
JOIN polygons_v p
  ON i.lon >= p.lon_min AND i.lon < p.lon_max
 AND i.lat >= p.lat_min AND i.lat < p.lat_max
""")

    o["caption_landmark_join"] = _oracle("""
SELECT i.image_id, l.landmark_id
FROM (SELECT * FROM images_v WHERE k % 53 = 0) i
JOIN landmarks_v l ON l.landmark_id = i.caption_landmark_id
""")

    o["dedup_exact"] = """
SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
FROM documents
GROUP BY md5(text)
"""

    o["token_stats"] = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INT) AS alpha_chars,
       CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS INT) AS punct_chars
FROM documents
"""

    o["lang_rollup"] = """
SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
FROM documents
GROUP BY lang
"""

    o["ann_cosine_top5"] = """
SELECT query_id, rank, vec_id, ROUND(cos, 6) AS cos_r
FROM (
  SELECT q.vec_id AS query_id, v.vec_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))
           / (SQRT(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
              * SQRT(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])))) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))
             / (SQRT(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                * SQRT(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])))) DESC,
             v.vec_id ASC
         ) AS rank
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id >= 5) v
) ranked
WHERE rank <= 5
"""

    return o

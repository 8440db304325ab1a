"""Extra isolation probes for optimization work (guide §1.4).

NOT part of the frozen bench contract — bench.py is the driver's
measurement. This file times individual legs with the noop sink at
arbitrary scale factors so optimizations can be attributed before the
full suite re-runs. Usage:

    python bench_extra.py <leg>[,<leg>...] [--sf-dir DIR] [--passes N]
        [--replicate N]

Legs: knn, minhash, mvt, s2, bloom, winnow, packing, contamination,
tile_rollup, dedup_exact, pip, shave, ann.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from vtshaver_spark.session import build_session
from vtshaver_spark.sources.views import features_with_props, register_views


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = sys.argv[1:]
    legs = args[0].split(",") if args and not args[0].startswith("--") else ["knn"]

    def opt(name, default):
        return args[args.index(name) + 1] if name in args else default

    sf_dir = opt("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    passes = int(opt("--passes", "3"))
    replicate = int(opt("--replicate", os.environ.get("SPARK_GRAFT_REPLICATE", "8")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = build_session(
        app_name="bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    register_views(spark, sf_dir)
    n_part = cpus

    def _replicate(df, n, partitions):
        df = df.repartition(partitions)
        if n > 1:
            df = df.withColumn(
                "_rep", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
            ).drop("_rep")
        return df

    # mirrors bench.py's corpus construction exactly — a deliberate
    # COPY, not an import: bench.py is frozen for measurement (the
    # driver diffs it against round-start fingerprints) so it cannot
    # be refactored to export a shared helper. If bench.py's corpus
    # synthesis ever changes in a build round, update this block to
    # match or per-leg probes stop predicting headline results.
    images = _replicate(spark.table("images_v"), replicate, n_part).cache()
    images.count()
    features = _replicate(features_with_props(spark), replicate, n_part).cache()
    features.count()
    landmarks = spark.table("landmarks_v")
    polygons = spark.table("polygons_v")

    text_factor = min(256, max(1, replicate // 4))
    documents = spark.table("documents").repartition(n_part)
    if text_factor > 1:
        salted = F.regexp_replace(
            F.col("text"),
            F.lit(r"((?:\S+ ){4})"),
            F.concat(F.lit("$1u"), F.col("_rep").cast("string"), F.lit(" ")),
        )
        documents = (
            documents.withColumn(
                "_rep", F.explode(F.sequence(F.lit(0), F.lit(text_factor - 1)))
            )
            .withColumn("doc_id", F.col("doc_id") * 100 + F.col("_rep"))
            .withColumn(
                "text",
                F.when(
                    F.col("_rep") < 4,
                    F.concat(F.col("text"), F.lit(" rep"), F.col("_rep")),
                ).otherwise(salted),
            )
            .drop("_rep")
        )

    def leg_fn(name):
        if name == "knn":
            from vtshaver_spark.operators.knn import knn_join_broadcast
            pts = images.select("image_id", "lon", "lat")
            return lambda: knn_join_broadcast(pts, landmarks, k=3).count()
        if name == "minhash":
            from vtshaver_spark.operators.dedup import minhash_lsh_candidates
            return lambda: minhash_lsh_candidates(
                documents, num_hashes=32, bands=8
            ).count()
        if name == "shave":
            from vtshaver_spark.operators.shave import shave
            from vtshaver_spark import Filters, style_to_filters
            from bench import EXPRESSION_ROAD_STYLE
            filters = Filters(style_to_filters(EXPRESSION_ROAD_STYLE))
            return lambda: shave(features, filters, zoom=16, maxzoom=16).count()
        if name == "pip":
            from vtshaver_spark.operators.pip import pip_rect_join
            return lambda: pip_rect_join(images, polygons).count()
        if name == "tile_rollup":
            from vtshaver_spark.functions import geo
            return (
                lambda: geo.with_tile(images, z=12)
                .groupBy("z", "x", "y")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.approx_count_distinct("caption_landmark_id").alias("c"),
                )
                .select(F.sum("n"), F.sum("c"))
                .collect()[0][0]
            )
        if name == "dedup_exact":
            from vtshaver_spark.operators.dedup import exact_dedup
            return lambda: exact_dedup(documents).count()
        if name == "s2":
            from vtshaver_spark.functions.s2 import with_s2_cell
            return (
                lambda: with_s2_cell(images, level=10)
                .select(F.countDistinct("cell_s2").alias("c"))
                .collect()[0][0]
            )
        if name == "ann":
            from vtshaver_spark.operators.ann import cosine_topk
            emb_base = spark.table("embeddings")
            embeddings = emb_base.repartition(n_part)
            emb_factor = text_factor
            if emb_factor > 1:
                embeddings = (
                    embeddings.withColumn(
                        "_rep", F.explode(F.sequence(F.lit(0), F.lit(emb_factor - 1)))
                    )
                    .withColumn("vec_id", F.col("vec_id") * 1000 + F.col("_rep"))
                    .drop("_rep")
                )
            q = emb_base.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            return lambda: cosine_topk(embeddings, q, k=10).count()
        if name == "bloom":
            from vtshaver_spark.operators.bloom import bloom_anti_join
            split = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(20))
            return lambda: bloom_anti_join(
                documents.filter(split != 0),
                documents.filter(split == 0),
                lambda: F.md5(F.col("text")),
                fpp=0.05,
            ).count()
        if name == "contamination":
            from vtshaver_spark.operators.contamination import contamination_report
            split = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(20))
            return lambda: contamination_report(
                train=documents.filter(split != 0),
                eval_df=documents.filter(split == 0),
                shingle_n=3,
                threshold=0.1,
            ).count()
        if name == "winnow":
            from vtshaver_spark.operators.dedup import winnow_fingerprints
            return lambda: winnow_fingerprints(
                documents.filter(F.col("doc_id") % 7 == 0), shingle_n=3, window=4
            ).count()
        if name == "packing":
            from vtshaver_spark.operators.packing import pack_token_sequences
            return lambda: pack_token_sequences(documents, seq_len=512).count()
        if name == "mvt":
            from vtshaver_spark.operators.shave import shave
            from vtshaver_spark.sources.mvt import decode_tiles, encode_tiles_mvt
            from vtshaver_spark import Filters, style_to_filters
            from bench import EXPRESSION_ROAD_STYLE
            filters = Filters(style_to_filters(EXPRESSION_ROAD_STYLE))
            mvt_factor = min(replicate, 32)
            fbase = features_with_props(spark).repartition(n_part)
            n_rows = fbase.count() * mvt_factor
            grid = max(4, int((n_rows / 50.0) ** 0.5) + 1)
            f = (
                fbase.withColumn(
                    "_rep", F.explode(F.sequence(F.lit(0), F.lit(mvt_factor - 1)))
                )
                .withColumn(
                    "x",
                    F.pmod(F.xxhash64("feature_id", "_rep"), F.lit(grid)).cast("bigint"),
                )
                .withColumn(
                    "y",
                    F.pmod(F.xxhash64("_rep", "feature_id"), F.lit(grid)).cast("bigint"),
                )
                .withColumn("z", F.lit(16).cast("int"))
                .drop("_rep")
            )
            tiles = encode_tiles_mvt(
                f.select("z", "x", "y", "layer", "feature_id", "geom_type", "props")
            ).cache()
            tiles.count()

            def run():
                rows = decode_tiles(tiles)
                shaved = shave(rows, filters, zoom=16, maxzoom=16)
                return encode_tiles_mvt(
                    shaved.select(
                        "z", "x", "y", "layer", "feature_id", "geom_type",
                        "geometry", "props", "prop_types",
                    )
                ).count()

            return run
        raise SystemExit(f"unknown leg {name!r}")

    out = {"sf_dir": sf_dir, "replicate": replicate, "passes": passes, "legs": {}}
    fns = {name: leg_fn(name) for name in legs}
    # warmup every leg once, then interleave timed passes
    for name in legs:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fns[name]()
    samples = {name: [] for name in legs}
    cnt = {}
    for _ in range(passes):
        for name in legs:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            cnt[name] = fns[name]()
            samples[name].append(round(time.perf_counter() - t0, 3))
    for name in legs:
        out["legs"][name] = {
            "min": min(samples[name]),
            "samples": samples[name],
            "count": cnt[name],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

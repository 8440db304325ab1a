"""Similarity search over embedding columns (array<float>).

 - ``cosine_topk``: exact brute force — Arrow matmul kernel with
   per-batch local top-k, tiny merge window.
 - ``lsh_cosine_topk``: scale path 1 — sign-random-projection
   bucketing (Arrow matmul + sign-pack) with multi-probe, exact
   re-rank inside buckets.
 - ``ivf_cosine_topk``: scale path 2 — coarse-quantized inverted
   lists + n_probe, exact re-rank.
 - ``cosine_near_dups``: all-corpus near-duplicate pairs via SRP
   bucket adjacency (the embedding member of the dedup family).

Hyperplanes/centroids are deterministic (no RNG state), which keeps
every pipeline replayable in the driver's SQL oracle.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Union

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns.

    Routes to the Arrow-batched numpy kernel (``cosine_pairs_fast``):
    the former zip_with/aggregate fold ran Spark's higher-order
    lambdas interpreted per element (~100x slower) — a footgun for
    library users, removed in r3."""
    return cosine_pairs_fast(a, b)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a broadcast-sized query set.

    Physical plan: the normalized query matrix rides into a
    ``mapInArrow`` kernel; each batch emits its exact local top-k per
    query (any global winner is a local winner, including under the
    (cos DESC, id ASC) tie order), and a tiny JVM window merges the
    per-batch candidates. One shuffle of batches x queries x k rows —
    independent of corpus size.

    Kernel disciplines (r4 rewrite — the old mapInPandas version spent
    ~70% of its wall in a per-row list() conversion, an allocating
    cosine divide, and a full stable argsort, ~395 ms/10k-row batch
    measured; this one runs ~70-95 ms):
      - zero-copy: list<float> values flatten straight out of the
        Arrow buffer and upcast into a grow-only float64 buffer;
      - allocation-free math: norms via einsum(out=), in-place row
        normalization, one dgemm into a reused (m x b) buffer;
      - selection via per-query kth-value threshold (np.partition) +
        mask — O(b) per query, no full sort; boundary ties are
        refined exactly (smallest ids win) with tiny lexsorts only
        for queries whose tie set exceeds k, so replica-heavy corpora
        (many identical vectors) cannot inflate the merge shuffle;
      - QUERY-BLOCKED: the (queries x batch) cosine block is computed
        and selected 64 queries at a time so it stays cache-resident
        instead of round-tripping DRAM (np.partition copies its
        input). Measured under 8-way worker concurrency: 604 -> 447
        ms/batch at m=2000, with per-worker slowdown vs 2-way falling
        11.6% -> 3.7% — DRAM-bandwidth contention is exactly what a
        packed executor (and this host's hi-core bench leg) hits.

    Output: query_id, rank, vec_id, cos (ties broken by vec_id).
    """
    from pyspark.sql import types as T

    q_rows = sorted(queries.select(query_id, vec_col).collect(), key=lambda r: r[query_id])
    if not q_rows:
        # empty query set: the exact answer is the empty result; an
        # unguarded fall-through would IndexError on q_unit.shape[1]
        return _empty_topk(queries, vectors, query_id, vec_id)
    q_ids = np.array([r[query_id] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_unit = q_mat / np.where(q_norm == 0.0, 1.0, q_norm)[:, None]
    m = q_unit.shape[0]
    dim = q_unit.shape[1]

    part_schema = T.StructType(
        [
            T.StructField(query_id, T.LongType(), False),
            T.StructField(vec_id, T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    from vtshaver_spark.plans.broadcast import ship_arrays

    get_q = ship_arrays(vectors.sparkSession, q_ids, q_unit)

    QB = 64  # query block rows: QB x 10k doubles = 5 MB, cache-resident

    def kernel(batches):
        import pyarrow as pa

        q_ids, q_unit = get_q()
        cap = 0
        M = C = N = None
        for rb in batches:
            b = rb.num_rows
            if b == 0:
                continue
            if b > cap:
                cap = max(b, 10000)
                M = np.empty((cap, dim))
                C = np.empty((QB, cap))
                N = np.empty(cap)
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            flat = rb.column(1).flatten().to_numpy(zero_copy_only=False)
            if flat.shape[0] != b * dim:
                raise ValueError(
                    f"embedding batch is not uniformly {dim}-dimensional"
                )
            Mb = M[:b]
            np.copyto(Mb, flat.reshape(b, dim))  # vectorized upcast
            Nb = N[:b]
            np.einsum("ij,ij->i", Mb, Mb, out=Nb)
            np.sqrt(Nb, out=Nb)
            np.maximum(Nb, np.finfo(np.float64).tiny, out=Nb)
            np.divide(Mb, Nb[:, None], out=Mb)
            MbT = Mb.T
            kk = min(k, b)
            outs_q, outs_v, outs_c = [], [], []
            for qs in range(0, m, QB):
                qe = min(qs + QB, m)
                nq = qe - qs
                # full batches (the common case) hit the contiguous
                # out= fast path; the per-partition tail allocates once
                Cb = C[:nq, :b] if b == cap else np.empty((nq, b))
                np.matmul(q_unit[qs:qe], MbT, out=Cb)
                # kth-largest per query; >= keeps boundary ties so the
                # exact winners are always in the candidate set
                th = np.partition(Cb, b - kk, axis=1)[:, b - kk]
                qi, vp = np.nonzero(Cb >= th[:, None])
                # qi is ascending (row-major nonzero): each query's
                # candidates are one contiguous segment
                seg = np.searchsorted(qi, np.arange(nq + 1))
                counts = seg[1:] - seg[:-1]
                if counts.max(initial=0) <= kk:
                    sel_q, sel_v = qi, vp
                    sel_c = Cb[qi, vp]
                else:
                    # exact per-query refinement where boundary ties
                    # pushed count > kk: smallest ids win, via tiny
                    # lexsorts over just that query's candidates
                    take = []
                    for s in np.nonzero(counts > kk)[0]:
                        lo, hi = seg[s], seg[s + 1]
                        c_seg = Cb[s, vp[lo:hi]]
                        i_seg = ids[vp[lo:hi]]
                        take.append(lo + np.lexsort((i_seg, -c_seg))[:kk])
                    for s in np.nonzero(counts <= kk)[0]:
                        take.append(np.arange(seg[s], seg[s + 1]))
                    sel_all = np.concatenate(take)
                    sel_q, sel_v = qi[sel_all], vp[sel_all]
                    sel_c = Cb[sel_q, sel_v]
                outs_q.append(q_ids[qs + sel_q])
                outs_v.append(ids[sel_v])
                outs_c.append(sel_c)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(outs_q), type=pa.int64()),
                    pa.array(np.concatenate(outs_v), type=pa.int64()),
                    pa.array(np.concatenate(outs_c), type=pa.float64()),
                ],
                names=[query_id, vec_id, "cos"],
            )

    candidates = vectors.select(vec_id, vec_col).mapInArrow(kernel, schema=part_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # id columns re-typed to the INPUT id types (no-op casts are
        # optimizer-eliminated for the standard long ids) so the
        # non-empty path's schema always matches _empty_topk's
        .withColumn(query_id, F.col(query_id).cast(queries.schema[query_id].dataType))
        .withColumn(vec_id, F.col(vec_id).cast(vectors.schema[vec_id].dataType))
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "vtshaver-ann-v1") -> np.ndarray:
    """Deterministic pseudo-random unit hyperplanes from a seed string
    (md5 counter mode -> uniform floats -> gaussian via Box-Muller)."""
    need = dim * n_planes
    vals = np.empty(need + (need & 1), dtype=np.float64)
    i = 0
    ctr = 0
    while i < vals.size:
        h = hashlib.md5(f"{seed}/{ctr}".encode()).digest()
        u1 = (int.from_bytes(h[:8], "big") + 1) / float(1 << 64)
        u2 = int.from_bytes(h[8:], "big") / float(1 << 64)
        r = np.sqrt(-2.0 * np.log(u1))
        vals[i] = r * np.cos(2 * np.pi * u2)
        if i + 1 < vals.size:
            vals[i + 1] = r * np.sin(2 * np.pi * u2)
        i += 2
        ctr += 1
    planes = vals[:need].reshape(n_planes, dim)
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def _srp_bucket_np(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-random-projection bucket ids for a row-matrix: one matmul
    against the plane matrix, sign-packed into int64 (one bit per
    hyperplane)."""
    bits = (mat @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def with_srp_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str,
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Append an SRP bucket column via an Arrow-batch numpy kernel.

    A Column formulation (zip_with/aggregate per plane) evaluates
    Spark's higher-order lambdas interpreted per element — measured
    ~100x slower than this batched matmul (same pathology PLANS.md
    documents for kNN/cosine). Map-only: no shuffle, passthrough of
    all input columns.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(bucket_col, T.LongType(), False)]
    )

    from vtshaver_spark.plans.broadcast import ship_arrays

    get_planes = ship_arrays(df.sparkSession, planes)

    def kernel(batches):
        (planes,) = get_planes()
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            pdf[bucket_col] = _srp_bucket_np(mat, planes)
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def cosine_pairs_fast(vec_a: Column, vec_b: Column) -> Column:
    """Vectorized cosine over two array<double> columns (Arrow-batched
    pandas UDF — for re-ranking joined candidate pairs)."""
    from vtshaver_spark.functions.pandas_kernels import cosine_pairs_udf

    return cosine_pairs_udf(vec_a, vec_b)


def _empty_topk(queries, vectors, query_id: str, vec_id: str):
    """Typed empty result for a zero-row query set — shared by every
    top-k entry point (an unguarded numpy path dies on shape (0,)).
    Id column types are DERIVED from the input frames (ADVICE r5:
    hardcoded LongType gave the empty path a different schema than the
    non-empty path whenever ids are strings or narrower ints, so
    downstream unions/joins behaved differently on empty query sets).
    """
    from pyspark.sql import types as T

    empty = T.StructType(
        [
            T.StructField(query_id, queries.schema[query_id].dataType, False),
            T.StructField(vec_id, vectors.schema[vec_id].dataType, False),
            T.StructField("cos", T.DoubleType(), False),
            T.StructField("rank", T.IntegerType(), False),
        ]
    )
    return queries.sparkSession.createDataFrame([], empty)


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: Optional[int] = None,
    probe_bits: int = 2,
    vec_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP bucket equi-join with multiprobe (query
    probes every bucket within ``probe_bits`` bit flips of its own),
    exact cosine re-rank within candidates. Recall/efficiency knobs:
    n_planes (bucket granularity) and probe_bits (candidate breadth)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    masks = srp_probe_masks(n_planes, probe_bits)
    # corpus side: bucket via Arrow matmul kernel (map-only)
    v = with_srp_bucket(
        vectors.select(
            F.col(vec_id), F.col(vec_col).cast("array<double>").alias("_vv")
        ),
        planes,
        "_vv",
    )
    # query side is broadcast-sized by contract: bucket + multiprobe
    # expansion on the driver (numpy), shipped as a broadcast join side
    q_rows = sorted(queries.select(query_id, vec_col).collect(), key=lambda r: r[query_id])
    if not q_rows:
        return _empty_topk(queries, vectors, query_id, vec_id)
    q_mat = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    b0 = _srp_bucket_np(q_mat, planes)
    probe_rows = [
        (int(r[query_id]), [float(x) for x in r[vec_col]], int(b0[i]) ^ m)
        for i, r in enumerate(q_rows)
        for m in masks
    ]
    q_probed = F.broadcast(
        vectors.sparkSession.createDataFrame(
            probe_rows, f"{query_id} long, _qv array<double>, _bucket long"
        )
    )
    scored = v.join(q_probed, "_bucket").withColumn(
        "cos", cosine_pairs_fast(F.col("_vv"), F.col("_qv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_qv", "_vv", "_bucket")
        # id columns re-typed to the INPUT id types (no-op casts are
        # optimizer-eliminated for the standard long ids) so the
        # non-empty path's schema always matches _empty_topk's
        .withColumn(query_id, F.col(query_id).cast(queries.schema[query_id].dataType))
        .withColumn(vec_id, F.col(vec_id).cast(vectors.schema[vec_id].dataType))
    )


def cosine_near_dups(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    probe_bits: int = 1,
    dim: Optional[int] = None,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: Optional[int] = 10000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector member of the
    dedup family: exact / MinHash / SimHash / embedding-cosine).

    Candidates are pairs whose SRP buckets differ by <= probe_bits
    bits: the LEFT occurrence of each vector explodes over the XOR
    probe masks and equi-joins the unexploded bucket column — bucketed
    generation, never all-pairs. Exact cosine verification
    (Arrow-batched) then applies ``threshold``. Deterministic
    hyperplanes -> the whole pipeline is replayable in SQL (driver
    oracle). ``max_bucket_size`` drops degenerate buckets (a capped
    bucket is near-identical mass — route it to exact dedup on the
    quantized vector instead).
    """
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    masks = srp_probe_masks(n_planes, probe_bits)
    v = with_srp_bucket(
        vectors.select(
            F.col(vec_id), F.col(vec_col).cast("array<double>").alias("_vv")
        ),
        planes,
        "_vv",
    )
    if max_bucket_size is not None:
        w_sizes = (
            v.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("_bucket")
        )
        v = v.join(w_sizes, "_bucket")
    probes = v.select(
        F.col(vec_id).alias("_ida"),
        F.col("_vv").alias("_va"),
        F.explode(
            F.array(*[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_bucket"),
    )
    # No distinct needed: for any set of DISTINCT probe masks, a pair
    # (a, b) matches exactly one mask (m = bucket_a XOR bucket_b), so
    # the join emits each candidate once — a distinct here would
    # shuffle full embedding vectors per pair for nothing.
    cand = (
        probes.join(
            v.select(
                F.col(vec_id).alias("_idb"),
                F.col("_vv").alias("_vb"),
                "_bucket",
            ),
            "_bucket",
        )
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb", "_va", "_vb")
    )
    return (
        cand.withColumn("cos", cosine_pairs_fast(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "cos",
        )
    )


def _seed_centroids(
    vectors: DataFrame, n_centroids: int, vec_id: str, vec_col: str
) -> np.ndarray:
    """Deterministic seed: the ``n_centroids`` corpus vectors with the
    smallest ids, unit-normalized (no RNG — SQL-replayable)."""
    cent_rows = (
        vectors.select(vec_id, vec_col).orderBy(vec_id).limit(n_centroids).collect()
    )
    cent_mat = np.array([list(r[vec_col]) for r in cent_rows], dtype=np.float64)
    # zero-norm seeds (padding / failed-embedding sentinels) would
    # divide to a NaN row, and NaN dot products capture np.argmax for
    # EVERY corpus vector — the whole corpus lands in one list
    norms = np.maximum(np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-30)
    return cent_mat / norms


def _assign_centroids(
    v: DataFrame, cent_norm: np.ndarray, emit_unit: bool = False
) -> DataFrame:
    """Map-only Arrow matmul-argmax: append ``_cent`` (nearest centroid
    by cosine) to a DataFrame with a ``_vv array<double>`` column.
    argmax returns the FIRST max -> ties break toward the smaller
    centroid index. ``emit_unit`` also emits the row's UNIT vector
    ``_uv`` (already computed for the cosine) so spherical-k-means
    training can sum unit vectors without an interpreted JVM lambda."""
    from pyspark.sql import types as T

    from vtshaver_spark.plans.broadcast import ship_arrays

    fields = list(v.schema.fields) + [
        T.StructField("_cent", T.IntegerType(), False)
    ]
    if emit_unit:
        fields.append(
            T.StructField("_uv", T.ArrayType(T.DoubleType()), False)
        )
    out_schema = T.StructType(fields)
    get_cent = ship_arrays(v.sparkSession, cent_norm)

    def assign(batches):
        (cent,) = get_cent()
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["_vv"]), dtype=np.float64)
            # zero-norm rows (failed-embedding sentinels) would turn
            # the whole row NaN and poison its argmax
            norms = np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
            )
            mat = mat / norms
            pdf["_cent"] = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
            if emit_unit:
                pdf["_uv"] = list(mat)
            yield pdf

    return v.mapInPandas(assign, schema=out_schema)


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> np.ndarray:
    """Deterministic spherical k-means-lite for IVF coarse quantizers.

    Seed = first ``n_centroids`` by id (the r2 'degenerate' choice,
    now only a starting point); each iteration is one map-only Arrow
    argmax assignment (which also emits the row's unit vector) plus
    ONE unit-vector-sum hash aggregation
    (``pyspark.ml.stat.Summarizer`` over a VectorUDT column — a JVM
    Aggregator with map-side partial merges), then a driver-side
    mean + renormalize. Empty clusters keep their previous centroid.
    No RNG anywhere, so the result is reproducible run-to-run and
    cluster-size-independent (sums are associative).

    100 TB shape: per iteration the corpus is touched once map-side;
    the aggregate shuffles exactly ``n_centroids`` rows each carrying
    one dim-length sum vector, regardless of dimension — the pre-r4
    formulation compiled ``dim`` separate sum expressions per pass
    (700+ aggregate columns at 768-dim production embeddings); this
    plan is dimension-invariant. n_iters is small (1-3 captures most
    of the recall gain; see tests/test_ann.py recall assertion).

    ``dim`` is no longer needed (the vector aggregate carries its own
    length); accepted for API compatibility and ignored.
    """
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    cent = _seed_centroids(vectors, n_centroids, vec_id, vec_col)
    v = vectors.select(F.col(vec_col).cast("array<double>").alias("_vv"))
    for _ in range(n_iters):
        # spherical k-means sums UNIT vectors: the metric is cosine
        # (scale-invariant), so raw sums would let one large-magnitude
        # outlier drag a centroid away from a thousand unit members
        assigned = _assign_centroids(v, cent, emit_unit=True)
        sums = (
            assigned.select("_cent", array_to_vector(F.col("_uv")).alias("_v"))
            .groupBy("_cent")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                Summarizer.sum(F.col("_v")).alias("_s"),
            )
            .collect()
        )
        new = cent.copy()
        for r in sums:
            mean = np.asarray(r["_s"].toArray(), dtype=np.float64) / r["_n"]
            norm = np.linalg.norm(mean)
            if norm > 0:
                new[r["_cent"]] = mean / norm
        cent = new
    return cent


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists, probe the ``n_probe`` closest
    lists per query, exact cosine re-rank inside them.

    ``centroids`` (rows unit-normalized) plugs in a trained coarse
    quantizer — ``train_centroids`` above — without touching the plan
    shape; the default is the deterministic first-n-by-id seed, which
    keeps the whole pipeline SQL-replayable for the correctness
    oracle. Assignment is a map-only Arrow matmul-argmax; probing
    joins a broadcast query list against the centroid column, so the
    corpus shuffles ONCE at most (pre-partition by ``_cent`` via
    plans.partitioning.repartition_by_cell to make probes
    partition-pruned at scale).
    """
    cent_norm = (
        centroids
        if centroids is not None
        else _seed_centroids(vectors, n_centroids, vec_id, vec_col)
    )

    v = vectors.select(
        F.col(vec_id), F.col(vec_col).cast("array<double>").alias("_vv")
    )
    assigned = _assign_centroids(v, cent_norm)

    q_rows = sorted(queries.select(query_id, vec_col).collect(), key=lambda r: r[query_id])
    if not q_rows:
        return _empty_topk(queries, vectors, query_id, vec_id)
    q_mat = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sims = q_mat @ cent_norm.T
    probe_rows = []
    for i, r in enumerate(q_rows):
        top = np.argsort(-sims[i], kind="stable")[:n_probe]
        for c in top:
            probe_rows.append(
                (int(r[query_id]), [float(x) for x in r[vec_col]], int(c))
            )
    q_probed = F.broadcast(
        vectors.sparkSession.createDataFrame(
            probe_rows, f"{query_id} long, _qv array<double>, _cent int"
        )
    )
    scored = assigned.join(q_probed, "_cent").withColumn(
        "cos", cosine_pairs_fast(F.col("_vv"), F.col("_qv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_qv", "_vv", "_cent")
        # id columns re-typed to the INPUT id types (no-op casts are
        # optimizer-eliminated for the standard long ids) so the
        # non-empty path's schema always matches _empty_topk's
        .withColumn(query_id, F.col(query_id).cast(queries.schema[query_id].dataType))
        .withColumn(vec_id, F.col(vec_id).cast(vectors.schema[vec_id].dataType))
    )


def _probe_assign(
    queries: DataFrame,
    cent_norm: np.ndarray,
    n_probe: int,
    query_id: str,
    vec_col: str,
) -> DataFrame:
    """Map-only Arrow kernel: emit ``n_probe`` (query_id, _qv, _cent)
    rows per query — the query's closest centroids by cosine, ties
    toward the smaller centroid index (stable argsort, matching
    ``_assign_centroids`` and the SQL oracle's ``cos DESC, cid ASC``).
    The distributed replacement for the driver-side probe loop in
    ``ivf_cosine_topk``: no collect, so the query side may be another
    100 TB table."""
    import pandas as pd
    from pyspark.sql import types as T

    from vtshaver_spark.plans.broadcast import ship_arrays

    out_schema = T.StructType(
        [
            T.StructField(query_id, T.LongType(), False),
            T.StructField("_qv", T.ArrayType(T.DoubleType()), False),
            T.StructField("_cent", T.IntegerType(), False),
        ]
    )
    get_cent = ship_arrays(queries.sparkSession, cent_norm)
    np_ = min(n_probe, cent_norm.shape[0])

    def kernel(batches):
        (cent,) = get_cent()
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["_qv"]), dtype=np.float64)
            # centroid ranking is scale-invariant per row (cent rows are
            # unit), so the raw dot product orders identically to cosine
            sel = np.argsort(-(mat @ cent.T), axis=1, kind="stable")[:, :np_]
            yield pd.DataFrame(
                {
                    query_id: np.repeat(
                        pdf[query_id].to_numpy(dtype=np.int64), np_
                    ),
                    "_qv": [v for v in pdf["_qv"] for _ in range(np_)],
                    "_cent": sel.ravel().astype(np.int32),
                }
            )

    return queries.select(
        F.col(query_id), F.col(vec_col).cast("array<double>").alias("_qv")
    ).mapInPandas(kernel, schema=out_schema)


def ivf_cosine_topk_distributed(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    centroids: Union[np.ndarray, str, None] = None,
    train_iters: int = 2,
) -> DataFrame:
    """IVF top-k with a DISTRIBUTED query side — same semantics as
    ``ivf_cosine_topk`` (same probes and tie rules), but the query set
    is never collected to the driver, so BOTH sides scale: corpus and
    queries can each be full-size tables.

    ``centroids``: an ndarray plugs in any coarse quantizer; ``None``
    (default) TRAINS one with ``train_centroids`` (``train_iters``
    k-means-lite passes) — this is the path you'd actually run at
    scale, and trained centroids carry a pinned recall win over the
    first-n-by-id seed (tests/test_ann.py). Pass ``"seed"`` for the
    untrained deterministic seed.

    Physical plan (the 100 TB shape):
      1. corpus → ``_assign_centroids`` (map-only Arrow argmax);
      2. queries → ``_probe_assign`` (map-only Arrow top-``n_probe``
         explode — |Q| × n_probe rows, each carrying its vector once);
      3. ONE shuffle-hash equi-join on the single int ``_cent`` key
         (probe side builds: |Q| × n_probe rows vs the corpus probe
         stream);
      4. exact cosine re-rank (Arrow pairs kernel), then the top-k
         window on ``query_id``. Spark ≥3.5 inserts a PARTIAL
         ``WindowGroupLimit`` below the window's exchange, so each
         map task forwards at most k candidate rows per query — the
         shuffle is corpus-size-independent without any explicit
         per-cell pre-cut (an earlier draft added a (cell, query)
         window for that; it cost a fourth exchange and duplicated
         what WindowGroupLimit already does, see
         test_ivf_distributed_three_shuffles_partial_limit).

    Sizing note: the join key has exactly ``n_centroids`` distinct
    values, so ``n_centroids`` must scale with the corpus (rule of
    thumb ~sqrt(N) lists, e.g. 10k-100k at production scale) to keep
    cells balanced; AQE skew-join splits residual hot cells. The
    driver-collected variant stays preferable only when the query set
    is broadcast-sized.

    Output: query_id, rank, vec_id, cos (ties broken by vec_id).
    """
    if centroids is None:
        cent_norm = train_centroids(
            vectors, n_centroids=n_centroids, n_iters=train_iters,
            vec_id=vec_id, vec_col=vec_col,
        )
    elif isinstance(centroids, str):
        if centroids != "seed":
            raise ValueError(f"centroids must be an ndarray, None, or 'seed', got {centroids!r}")
        cent_norm = _seed_centroids(vectors, n_centroids, vec_id, vec_col)
    else:
        cent_norm = centroids
    v = vectors.select(
        F.col(vec_id), F.col(vec_col).cast("array<double>").alias("_vv")
    )
    assigned = _assign_centroids(v, cent_norm)
    probes = _probe_assign(queries, cent_norm, n_probe, query_id, vec_col)

    scored = (
        assigned.join(probes.hint("shuffle_hash"), "_cent")
        .withColumn("cos", cosine_pairs_fast(F.col("_vv"), F.col("_qv")))
        .select(query_id, vec_id, "cos")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col(vec_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_probe_masks(n_planes: int, probe_bits: int) -> list:
    """Multiprobe XOR masks: own bucket, then all buckets within
    ``probe_bits`` bit flips — ALL of them (a hardcoded two-flip cap
    once silently delivered probe_bits=2 recall for any higher
    setting)."""
    from itertools import combinations

    masks = [0]
    for k in range(1, min(probe_bits, n_planes) + 1):
        masks += [
            sum(1 << i for i in bits)
            for bits in combinations(range(n_planes), k)
        ]
    return masks

"""Deduplication operators for training-data pipelines.

All variants are shuffle-conscious: exact dedup is one hash
aggregation; MinHash-LSH generates candidates via band-bucket joins
(each doc replicates #bands times — never pairwise across the corpus);
SimHash is a single aggregation per doc over exploded tokens.

No Python in any hot path: hashing is ``xxhash64`` (JVM), signatures
are built with higher-order array functions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import (
    fingerprint64,
    portable_hash60,
    shingles,
    tokens,
)


# Mersenne prime modulus for the universal hash family (fits signed-64
# products: a, x < 2^31 -> a*x + b < 2^62).
MH_PRIME = (1 << 31) - 1


def _family_constants(j: int) -> tuple[int, int]:
    """Deterministic (a, b) for the j-th universal hash
    h_j(x) = (a*x + b) mod MH_PRIME, a in [1, p-1], b in [0, p-1].
    Derived from md5 so the family is reproducible without RNG state.

    The modulus is essential: an affine map WITHOUT it is monotonic in
    x, so min-over-shingles picks the same shingle for every j and the
    'independent' family is perfectly correlated (observed: LSH
    candidates at jaccard 0.01)."""
    d = hashlib.md5(f"vtshaver-mh:{j}".encode()).digest()
    a = int.from_bytes(d[:4], "big") % (MH_PRIME - 1) + 1
    b = int.from_bytes(d[4:8], "big") % MH_PRIME
    return a, b


def _salted_hash(col: Column, j: int, hash_mode: str) -> Column:
    """j-th member of an independent hash family over a string column.

    ``fast``  — ONE xxhash64 of the string, then a 32-bit
                multiply-shift (a_j * (h & 0xffffffff) + b_j): the
                string is hashed once regardless of family size, each
                extra member costs two long ops and stays inside
                signed-64 range (ANSI-safe). This is the 100 TB path.
    ``portable`` — md5-derived 60-bit hash with the salt concatenated,
                bit-identical to DuckDB ``md5_number_lower`` (the
                correctness-oracle path; ~10x slower, value-exact).
    """
    if hash_mode == "portable":
        return portable_hash60(F.concat(F.lit(f"{j}:"), col))
    a, b = _family_constants(j)
    base = F.pmod(F.xxhash64(col), F.lit(MH_PRIME))
    return F.pmod(base * F.lit(a) + F.lit(b), F.lit(MH_PRIME))


def _bucket_hash(col: Column, hash_mode: str) -> Column:
    if hash_mode == "portable":
        return portable_hash60(col)
    return F.xxhash64(col)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact near-identical dedup on normalized content hash.

    Output: one row per distinct content — keeper id (min id), group
    size. One shuffle (hash aggregate with map-side partials).
    """
    return (
        df.withColumn("_fp", fingerprint64(F.col(text_col)))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .withColumnRenamed("_fp", "content_fp")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_mode: str = "fast",
) -> DataFrame:
    """MinHash signatures: one row per doc, ``sig: array<bigint>``.

    Formulated as explode + ONE grouped aggregation with
    ``num_hashes`` MIN columns: the shingle tokenization (regex) runs
    exactly once per document and map-side partials shrink the shuffle
    to one row per doc. In the default ``fast`` hash mode each shingle
    string is hashed ONCE (xxhash64) and the family is derived by
    32-bit multiply-shift — 2 long ops per extra hash instead of a
    fresh string hash (measured dominant cost of the LSH suite).
    ``portable`` mode uses the DuckDB-reproducible md5 hash for the
    correctness oracle.

    Docs with no shingles (shorter than the shingle width) are absent
    from the output, matching "no signature".
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_s"),
    )
    if hash_mode == "fast":
        # hash the string once; the family is (a*x + b) mod p over the
        # reduced base (a pure affine map without the modulus is
        # monotonic — all mins pick the same shingle).
        # Expressions render as SQL strings (r6): the per-member Column
        # construction cost ~8 py4j round trips x num_hashes (~0.3s of
        # driver time per call at 32 hashes); F.expr parses each member
        # in one call into the same Catalyst tree.
        sh = sh.withColumn("_b32", F.pmod(F.xxhash64("_s"), F.lit(MH_PRIME)))
        consts = [_family_constants(j) for j in range(num_hashes)]
        aggs = [
            F.expr(f"min(pmod(_b32 * {a} + {b}, {MH_PRIME})) AS _h{j}")
            for j, (a, b) in enumerate(consts)
        ]
    else:
        aggs = [
            F.min(_salted_hash(F.col("_s"), j, hash_mode)).alias(f"_h{j}")
            for j in range(num_hashes)
        ]
    sig_cols = ", ".join(f"_h{j}" for j in range(num_hashes))
    return sh.groupBy("doc").agg(*aggs).selectExpr(
        "doc", f"array({sig_cols}) AS _sig"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_mode: str = "fast",
    max_bucket_size: int | None = 1000,
    capped_sink: list | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows/bands rows shuffle per doc (band keys), self-join per bucket,
    pairs deduped with id ordering. Output: (doc_a, doc_b, n_shared_bands).

    Physical shape (one signature computation, no self-join): banded
    rows shuffle ONCE into a grouped ``collect_list`` per (band,
    bucket); each bucket's sorted doc list expands to its i<j pairs
    inline (array lambdas over bucket contents only — never the
    corpus). A self-join formulation re-derives the whole signature
    pipeline once per join side (measured 2-3x the suite cost at
    sf0.1 x64).

    Buckets are filtered to size in [2, max_bucket_size]: >= 2 drops
    the (dominant) singleton buckets before pair expansion, and the
    cap bounds the quadratic blow-up of degenerate hot buckets
    (boilerplate-heavy corpora collapse into one bucket whose size^2/2
    pairs would dwarf the rest of the job). A capped bucket is
    near-identical content — route it to exact_dedup instead of
    pairwise comparison. Pass ``capped_sink=[]`` to make that routing
    POSSIBLE: the list receives one DataFrame of
    (band, bucket, bucket_size, docs) rows for every bucket the cap
    dropped, so the drop is observable instead of silently reading as
    "no duplicates found" (no-silent-caps discipline).
    """
    if bands < 1 or bands > num_hashes or num_hashes % bands:
        # bands > num_hashes makes rows_per_band 0 (every doc in ONE
        # empty-key bucket per band -> the cap drops them all: silent
        # 100% recall loss); a non-divisor silently discards hashes
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, hash_mode)
    if hash_mode == "fast":
        # one selectExpr (r6): the Column form of the banded struct
        # array cost ~150 py4j round trips of driver time per call;
        # inline() explodes the struct array straight into the same
        # (band, bucket) columns. The literal xxhash64 below IS
        # _bucket_hash's fast mode spelled as SQL — if that helper's
        # fast branch ever changes, this string must change with it
        # (the portable branch below still routes through the helper)
        structs = ", ".join(
            "named_struct('band', {b}, 'bucket', xxhash64(concat_ws(',', {parts})))".format(
                b=b,
                parts=", ".join(
                    f"cast(_sig[{b * rows_per_band + r}] as string)"
                    for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
        banded = sig.selectExpr("doc", f"inline(array({structs}))")
    else:
        banded = sig.select(
            "doc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            _bucket_hash(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.col("_sig")[b * rows_per_band + r].cast("string")
                                        for r in range(rows_per_band)
                                    ],
                                ),
                                hash_mode,
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("doc", "bb.band", "bb.bucket")
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc")).alias("_docs"))
        .filter(F.size("_docs") >= 2)
    )
    if max_bucket_size is not None:
        if capped_sink is not None:
            capped_sink.append(
                buckets.filter(F.size("_docs") > max_bucket_size).select(
                    "band",
                    "bucket",
                    F.size("_docs").alias("bucket_size"),
                    F.col("_docs").alias("docs"),
                )
            )
        buckets = buckets.filter(F.size("_docs") <= max_bucket_size)
    # Re-spread surviving buckets across full parallelism before the
    # CPU-heavy expansion: AQE's post-shuffle coalescing sizes
    # partitions by the (tiny) bucket-row bytes, not by the size^2
    # rows each bucket EXPANDS to — measured running the expansion on
    # half the cores at local[32]. The extra shuffle moves only the
    # filtered bucket rows (orders of magnitude below the banded set).
    buckets = buckets.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # i<j expansion as two JVM Generate operators + codegen'd filter
    # (higher-order transform lambdas evaluate interpreted — measured
    # ~2x slower on 3.3M pairs; the size<=cap bound keeps the
    # size^2-per-bucket intermediate harmless)
    return (
        buckets.select(F.explode("_docs").alias("doc_a"), "_docs")
        .select("doc_a", F.explode("_docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs.

    Joins shingle sets onto the (small) candidate pair set and computes
    |A∩B| / |A∪B| with array intersection — the standard LSH
    verify step.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "_sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.when(
                F.size(F.array_union("_sh_a", "_sh_b")) > 0,
                F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
                / F.size(F.array_union("_sh_a", "_sh_b")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_sh_a", "_sh_b")
    )


def jaccard_similarity_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_token_bucket: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard self-join via prefix filtering
    (VernicaJoin / PPJoin family): returns ALL pairs with
    Jaccard(shingles(a), shingles(b)) >= threshold — no probabilistic
    recall loss, unlike the MinHash-LSH candidate path.

    Prefix-filtering principle: order every doc's shingle set by a
    single global total order (ascending document frequency, ties by
    token), and keep only the first ``p = |X| - ceil(t*|X|) + 1``
    tokens. Any pair with Jaccard >= t must then share a token within
    both prefixes [proof: J >= t implies |A∩B| >= ceil(t*|X|) for
    each side X, and two sets sharing >= k elements each have a shared
    element among their first |X|-k+1 under a common total order].
    The ceil is computed as ``ceil(t*|X| - 1e-9)`` so float jitter in
    ``t*|X|`` can only UNDERestimate it — which lengthens the prefix
    and preserves recall (``|X| - floor(t*|X|)``, used before r4, is
    one token SHORT exactly when t*|X| is an integer: e.g. t=0.5,
    A={o1..o4}, B={o3,o4} has J=0.5 but prefixes {o1,o2} vs {o3}
    never meet). Candidates come from an equi-join on prefix tokens —
    never an all-pairs product — then exact verification.

    Shuffle inventory: (1) token-frequency agg, (2) freq join back,
    (3) per-doc sort agg, (4) prefix-token self-join, (5) verify joins
    (ngram_jaccard). Every shuffle/join keys on ``xxhash64(token)`` —
    ONE long column (LongHashedRelation fast path; the raw n-gram
    string would shuffle tens of variable-length bytes per key and
    hash generic UnsafeRows). The total order becomes
    (freq-of-hash, hash): prefix filtering is recall-lossless under
    ANY shared total order, and a hash collision merely merges two
    tokens' frequency counts / admits extra candidates — the exact
    verification step decides membership, so the RESULT set is
    unchanged. Rarest-first ordering makes prefix tokens the
    LOW-frequency ones, so join buckets stay small on natural text.
    ``max_token_bucket`` optionally drops prefix tokens whose bucket
    exceeds the cap (boilerplate guard: turns the join approximate;
    leave None for exact semantics).
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1) — use exact_dedup for t=1")
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    ex = sh.select("_id", F.explode("_sh").alias("_t")).select(
        "_id", F.xxhash64("_t").alias("_tok")
    )
    freq = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # per-doc rarest-first order + prefix slice, all codegen (array of
    # struct sorts by field order; getField on array<struct> projects
    # the token-hash array without an interpreted lambda)
    pref = (
        ex.join(freq, "_tok")
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df").alias("f"), F.col("_tok").alias("t")))
            ).alias("_ord"),
            F.count(F.lit(1)).alias("_sz"),
        )
        .withColumn(
            "_plen",
            F.greatest(
                F.lit(1),
                (
                    F.col("_sz")
                    - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
                    + 1
                ).cast("int"),
            ),
        )
        .select(
            "_id",
            "_sz",
            F.slice(F.col("_ord").getField("t"), F.lit(1), F.col("_plen")).alias("_pref"),
        )
    )
    ptok = pref.select("_id", "_sz", F.explode("_pref").alias("_tok"))
    if max_token_bucket is not None:
        tok_n = ptok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_n"))
        ptok = ptok.join(
            tok_n.filter(F.col("_n") <= max_token_bucket).select("_tok"), "_tok"
        )
    # length filter: J >= t forces t*|B| <= |A| <= |B|/t; the 1e-9
    # slack only ADMITS borderline candidates (verification is exact)
    cand = (
        ptok.alias("l")
        .join(ptok.alias("r"), "_tok")
        .filter(F.col("l._id") < F.col("r._id"))
        .filter(F.col("l._sz") >= F.lit(threshold) * F.col("r._sz") - F.lit(1e-9))
        .filter(F.col("r._sz") >= F.lit(threshold) * F.col("l._sz") - F.lit(1e-9))
        .select(F.col("l._id").alias("doc_a"), F.col("r._id").alias("doc_b"))
        .distinct()
    )
    return ngram_jaccard(df, cand, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "fast",
    n_bits: int = 64,
) -> DataFrame:
    """SimHash fingerprint per document (64-bit default).

    Classic bit-vote construction, fully relational: explode tokens,
    hash each (xxhash64; ``portable`` mode uses the 60-bit
    DuckDB-reproducible md5 hash, so pass n_bits=60 with it), then for
    every bit position sum +1/-1 votes in ONE aggregation (n_bits
    conditional sums, map-side combined), and reassemble the
    fingerprint from vote signs.
    """
    if hash_mode == "portable" and n_bits > 60:
        raise ValueError("portable hash provides 60 bits; pass n_bits<=60")
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn(
        "h",
        portable_hash60(F.col("tok")) if hash_mode == "portable" else F.xxhash64("tok"),
    )
    votes = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
        fp = fp + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc", fp.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    hash_mode: str = "fast",
    n_bits: int = 64,
    max_bucket_size: int | None = 100_000,
    capped_sink: list | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    chunks — any pair within the distance budget shares at least one
    exact chunk, so candidates come from equi-joins on chunk values
    (no quadratic blow-up), then exact popcount verification.

    The pigeonhole guarantee requires ``blocks > max_hamming``: a pair
    differing in max_hamming bits spread across max_hamming distinct
    chunks still shares one of blocks > max_hamming chunks.
    """
    sim = simhash64(df, id_col, text_col, hash_mode, n_bits)
    return hamming_block_join(
        sim, id_col="doc", fp_col="simhash",
        max_hamming=max_hamming, blocks=blocks, n_bits=n_bits,
        max_bucket_size=max_bucket_size, capped_sink=capped_sink,
    )


def hamming_block_join(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int,
    blocks: int,
    n_bits: int = 64,
    max_bucket_size: int | None = 100_000,
    capped_sink: list | None = None,
) -> DataFrame:
    """ALL pairs of rows whose ``fp_col`` fingerprints are within
    ``max_hamming`` bits, via exact pigeonhole blocking — the generic
    core shared by simhash text near-dups and phash image near-dups.

    Split the fingerprint into ``blocks`` chunks: a pair differing in
    <= max_hamming bits spread over max_hamming distinct chunks still
    shares one of blocks > max_hamming chunks, so candidates come
    from equi-joins on chunk values (no quadratic blow-up), then exact
    popcount verification. ``blocks`` must divide ``n_bits`` — a
    remainder would leave bits outside every chunk and silently void
    the guarantee. Arithmetic shiftright + mask extracts chunks
    correctly for sign-folded 64-bit fingerprints.

    Output columns: (doc_a, doc_b, hamming), doc_a < doc_b.

    ``max_bucket_size`` caps a (block, chunk) bucket's pair expansion
    (size^2/2), the same discipline as minhash_lsh_candidates: flat
    images / short docs vote whole chunks to 0, so web-scale corpora
    concentrate one degenerate chunk value — an uncapped bucket of 1M
    rows would expand to ~5e11 pairs. A capped bucket is
    near-identical content; route it to exact grouping instead. The
    cap makes the documented ALL-pairs contract approximate, so it is
    OBSERVABLE (ADVICE r5 / no-silent-caps discipline): pass
    ``capped_sink=[]`` to receive one DataFrame of
    (blk, chunk, bucket_size, docs) rows for every bucket the cap
    dropped, or ``max_bucket_size=None`` for the exact uncapped join.
    """
    if blocks <= max_hamming:
        raise ValueError(
            f"pigeonhole blocking needs blocks > max_hamming "
            f"(got blocks={blocks}, max_hamming={max_hamming}); "
            f"pairs would be silently dropped"
        )
    if n_bits % blocks != 0:
        raise ValueError(
            f"blocks={blocks} must divide n_bits={n_bits}: a partial "
            f"chunk leaves uncovered bits and voids the pigeonhole "
            f"recall guarantee"
        )
    width = n_bits // blocks
    mask = (1 << width) - 1
    sim = fps.select(F.col(id_col).alias("doc"), F.col(fp_col).alias("_fp"))
    chunks = sim.select(
        "doc",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("_fp"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select("doc", "_fp", "bc.blk", "bc.chunk")
    # one grouped collect per (block, chunk) + inline i<j pair
    # expansion — the fingerprint computation runs once (a self-join
    # would re-derive it per side), same shape as minhash_lsh_candidates
    buckets = (
        chunks.groupBy("blk", "chunk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc"), F.col("_fp")))
            ).alias("_ds")
        )
        .filter(F.size("_ds") >= 2)
    )
    if max_bucket_size is not None:
        if capped_sink is not None:
            capped_sink.append(
                buckets.filter(F.size("_ds") > max_bucket_size).select(
                    "blk",
                    "chunk",
                    F.size("_ds").alias("bucket_size"),
                    F.col("_ds.doc").alias("docs"),
                )
            )
        buckets = buckets.filter(F.size("_ds") <= max_bucket_size)
    # spread the size^2 expansion across full parallelism (see
    # minhash_lsh_candidates)
    buckets = buckets.repartition(fps.sparkSession.sparkContext.defaultParallelism)
    cand = (
        buckets.select(F.explode("_ds").alias("l"), "_ds")
        .select("l", F.explode("_ds").alias("r"))
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.col("l._fp").alias("_fp_a"),
            F.col("r._fp").alias("_fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("_fp_a").bitwiseXOR(F.col("_fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .drop("_fp_a", "_fp_b")
    )


def neardup_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: the step
    that turns ANY pair generator's output (minhash/simhash/phash/
    jaccard/embedding) into dedup DECISIONS. Returns (node, rep) where
    ``rep`` is the minimum id reachable from ``node`` — the canonical
    representative every member of a duplicate cluster agrees on.

    Algorithm: iterative min-label propagation. Each round every node
    takes the min of its own label and its neighbors' labels — one
    equi-join + one hash aggregation per round, converging in
    graph-diameter rounds (near-dup clusters are shallow; transitive
    chains rarely exceed a handful of hops). The loop is driver-side
    CONTROL FLOW only: data never leaves the cluster, and each round
    ends in an eager localCheckpoint that truncates the growing
    lineage (without it, round k's plan re-derives rounds 1..k-1).

    100 TB shape: per-round cost is one shuffle of |E| messages plus
    one |V| aggregation, map-side combined. A pathological hot
    component (one label received by millions of nodes) skews the
    aggregation key — AQE skew-split handles it (the key count per
    node is bounded by its degree, and degree is bounded by the pair
    generators' bucket caps upstream). For graphs with whale
    components and large diameters the two-phase large-star/small-star
    algorithm (Kiveris et al.) halves round count; not needed at
    near-dup shapes.

    Convergence is checked with a changed-label count per round (one
    action); raises if ``max_iter`` rounds don't reach a fixpoint —
    silent truncation would merge clusters nondeterministically.
    """
    # symmetric edge list (propagation must flow both directions)
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min neighbor label per node
        msgs = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        updated = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
                (F.coalesce("nlab", "lab") < F.col("lab")).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            return labels.select("node", F.col("lab").alias("rep"))
    raise RuntimeError(
        f"neardup_components did not converge in {max_iter} rounds; "
        f"the pair graph has a longer-diameter component than expected"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    window: int = 4,
    hash_mode: str = "fast",
) -> DataFrame:
    """Positional document fingerprints by (standard) winnowing with
    the rightmost-min tie rule — the rolling-hash fingerprint family
    (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003; the MOSS algorithm), complementing the set-based
    sketches (MinHash/SimHash): winnowed fingerprints carry POSITIONS,
    so shared fingerprints localize the matching passage
    (plagiarism/contamination detection), and selection is guaranteed
    to pick at least one fingerprint from every ``window``-length run
    of k-grams (any match of length >= window + shingle_n - 1 tokens
    is detected).

    Algorithm: positional k-gram hashes; every window of ``window``
    consecutive hashes selects its minimum, rightmost on ties; the
    DISTINCT selected (hash, pos) set is the sketch (expected density
    2/(window+1)).

    Formulated window-explicitly so Spark and the SQL oracle share one
    definition: each hash at position p serves the windows
    ``p-window+1 .. p`` (clipped to valid starts); a per-(doc, window)
    MIN over a (fp, -pos) struct implements rightmost-min-wins. One
    explode + one grouped aggregation (map-side partials shrink the
    exchange) + one distinct; expansion factor is exactly ``window``
    and all keys carry the doc id, so the 100 TB shape is per-doc-
    local work behind doc-hash exchanges — no corpus-wide products
    anywhere. The shingle count n comes from ``size()`` of the same
    array the explode consumes (r6) — the former doc-partitioned
    count() window spent a full extra exchange + per-partition
    materialization just to compute it. (A sliding ROWS-frame window
    formulation was A/B'd in r6 and is 2x SLOWER at sf1.0: the per-doc
    sort costs more than the window-fold explode into a partial hash
    agg.)

    Docs with fewer than ``window`` k-grams have no complete window
    and produce no fingerprints (the MOSS contract: texts shorter than
    the guarantee threshold t = window + shingle_n - 1 are below the
    detectable-match floor).

    Output: one row per fingerprint — (doc, pos, fp).
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(shingles(F.col(text_col), shingle_n)).alias("pos", "_s"),
    )
    if hash_mode == "portable":
        h = portable_hash60(F.col("_s"))
    else:
        h = F.pmod(F.xxhash64("_s"), F.lit(MH_PRIME))
    sh = sh.select("doc", "pos", h.alias("fp"))
    exp = (
        sh.select(
            "doc", "pos", "fp",
            F.explode(
                F.sequence(F.lit(0), F.lit(window - 1))
            ).alias("_off"),
        )
        .withColumn("win", F.col("pos") - F.col("_off"))
        .filter(F.col("win") >= 0)
    )
    # positions are dense 0..n-1, so a window start is valid
    # (win <= n - window) exactly when its group holds `window`
    # members — the count test replaces the former per-doc count()
    # window pass that existed only to compute n (one full exchange
    # plus per-partition materialization of the corpus, r6)
    sel = (
        exp.groupBy("doc", "win")
        .agg(
            F.min(
                F.struct(
                    F.col("fp"), (-F.col("pos")).alias("_np"), F.col("pos")
                )
            ).alias("_m"),
            F.count(F.lit(1)).alias("_c"),
        )
        .filter(F.col("_c") == window)
        .select("doc", F.col("_m.pos").alias("pos"), F.col("_m.fp").alias("fp"))
    )
    return sel.distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    hash_mode: str = "fast",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    — passage-level overlap detection (contamination/plagiarism),
    positionless on the pair side.

    Same candidate-generation discipline as the LSH paths: group by
    fingerprint value, cap pathological buckets (a fingerprint shared
    by thousands of docs is boilerplate, not plagiarism — and its
    pair expansion is quadratic), expand pairs bucket-locally, then
    count shared fingerprints per pair. Never an all-pairs product.

    Output: (doc_a, doc_b, shared) with doc_a < doc_b.
    """
    fps = winnow_fingerprints(
        df, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        window=window, hash_mode=hash_mode,
    ).select("doc", "fp").distinct()
    grouped = fps.groupBy("fp").agg(
        F.sort_array(F.collect_list("doc")).alias("_docs"),
        F.count("*").alias("_sz"),
    ).filter(F.col("_sz") >= 2)
    if max_bucket_size is not None:
        grouped = grouped.filter(F.col("_sz") <= max_bucket_size)
    pairs = (
        grouped.select(
            F.explode("_docs").alias("doc_a"), F.col("_docs").alias("_ds")
        )
        .select("doc_a", F.explode("_ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )

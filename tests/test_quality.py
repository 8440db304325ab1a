"""Repetition quality signals (operators/quality.py)."""

from vtshaver_spark.operators.quality import repetition_signals


def test_repetition_signals(spark):
    rows = [
        (1, "spam click here click here click here"),
        (2, "every word unique in this one sentence"),
        (3, "x"),           # one token: no bigram
        (4, "... !!! ---"),  # zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r.asDict() for r in repetition_signals(df).collect()}

    r1 = got[1]  # tokens: spam click here click here click here (7)
    assert r1["n_tokens"] == 7
    assert abs(r1["dup_token_frac"] - (1 - 3 / 7)) < 1e-12
    assert r1["top_bigram"] == "click here" and r1["top_bigram_count"] == 3
    # norm string "spam click here click here click here" = 37 chars
    assert abs(r1["top_bigram_char_frac"] - 3 * 10 / 37.0) < 1e-12

    r2 = got[2]
    assert r2["dup_token_frac"] == 0.0 and r2["top_bigram_count"] == 1
    # tie-break: all bigrams count 1 -> lexicographically smallest
    assert r2["top_bigram"] == min(
        f"{a} {b}" for a, b in zip(
            "every word unique in this one sentence".split(),
            "word unique in this one sentence".split(),
        )
    )

    assert got[3]["top_bigram"] is None and got[3]["top_bigram_count"] == 0
    assert got[3]["top_bigram_char_frac"] == 0.0
    assert got[4]["n_tokens"] == 0 and got[4]["dup_token_frac"] == 0.0

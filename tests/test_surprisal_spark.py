"""unigram_surprisal (functions/textops.py): hand-computed goldens and
the exact-integer invariants."""

from dachshund_spark.functions.textops import unigram_surprisal


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_surprisal_golden(spark):
    # corpus: "a a a b" + "a c"  -> N=6, counts a=4, b=1, c=1
    # floor_log2: N->2, a->2, b/c->0 ; bits: a=0, b=2, c=2
    rows = {
        r["doc_id"]: (r["n_tokens"], r["sum_bits"], r["mean_millibits"])
        for r in unigram_surprisal(
            _docs(spark, [(1, "a a a b"), (2, "a  c")])
        ).collect()
    }
    assert rows == {1: (4, 2, 500), 2: (2, 2, 1000)}


def test_surprisal_rarer_scores_higher(spark):
    docs = [(i, "the common text body") for i in range(20)] + [
        (99, "zq7 xv9 qqj unique gibberish")
    ]
    rows = {
        r["doc_id"]: r["mean_millibits"]
        for r in unigram_surprisal(_docs(spark, docs)).collect()
    }
    assert rows[99] > rows[0]
    assert all(v >= 0 for v in rows.values())


def test_surprisal_blank_docs_absent(spark):
    out = unigram_surprisal(_docs(spark, [(1, "   "), (2, "x y")])).collect()
    assert sorted(r["doc_id"] for r in out) == [2]


def test_surprisal_uniform_corpus_all_equal_bits(spark):
    # 4 distinct singleton tokens: N=4 (log2=2), each count 1 (log2=0)
    out = unigram_surprisal(_docs(spark, [(1, "p q"), (2, "r s")])).collect()
    for r in out:
        assert (r["sum_bits"], r["mean_millibits"]) == (4, 2000)

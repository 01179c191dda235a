"""Line-level boilerplate dedup (functions/linededup.py): threshold
boundary, order preservation, and the all-boilerplate edge case."""

import hashlib

from dachshund_spark.functions.linededup import line_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_semantics(spark):
    rows = [
        (0, "shared nav\nbody zero\nshared footer"),
        (1, "shared nav\nbody one a\nbody one b\nshared footer"),
        (2, "shared nav\nbody two\nshared footer"),
        # doc 3 is boilerplate-only: kept text is empty -> md5("")
        (3, "shared nav\nshared footer"),
        # "almost shared" appears in exactly 2 docs < min_docs=3: kept
        (4, "almost shared\nbody four"),
        (5, "almost shared\nbody five"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_boiler"], r["kept_md5"])
        for r in line_dedup(df, min_docs=3).collect()
    }
    assert got[0] == (3, 2, _md5("body zero"))
    # original line order must survive reassembly
    assert got[1] == (4, 2, _md5("body one a\nbody one b"))
    assert got[3] == (2, 2, _md5(""))
    assert got[4] == (2, 0, _md5("almost shared\nbody four"))
    assert got[5] == (2, 0, _md5("almost shared\nbody five"))


def test_line_dedup_duplicate_line_within_one_doc(spark):
    # a line repeated WITHIN one doc counts as 1 distinct doc — not
    # boilerplate at min_docs=2 unless a second doc has it too
    rows = [
        (0, "dup line\ndup line\nunique zero"),
        (1, "other\nunique one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_boiler"])
        for r in line_dedup(df, min_docs=2).collect()
    }
    assert got[0] == (3, 0)
    assert got[1] == (2, 0)

"""Interleaved A/B: SCC trim-layer trivial-set shape.

Old: (remaining anti srcs) union (remaining anti dsts) distinct.
New: remaining anti (srcs semi dsts) — set-identical
(A \ B) ∪ (A \ C) == A \ (B ∩ C), one fewer pass over remaining and
one fewer exchange per trim layer.  Outputs asserted identical per
pair.

Usage: python tools/ab_trim_shape.py [n_pairs] [sf_dir]
"""

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab_trim_shape",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E  # noqa: E402
    from dachshund_spark.operators import components as CO  # noqa: E402

    e = E.event_cyc_edges(spark, sf_dir).persist()
    e.count()

    def run(old):
        CO._TRIM_UNION_SHAPE = old
        t0 = time.time()
        out = sorted(
            (r.v, r.component)
            for r in CO.strongly_connected_components(e, max_outer=80)
            .collect()
        )
        sec = round(time.time() - t0, 1)
        return sec, hashlib.md5(json.dumps(out).encode()).hexdigest()

    wu = run(False)
    print(f"warmup new: {wu[0]}s", flush=True)
    wins = 0
    for p in range(n_pairs):
        if p % 2 == 0:
            t_n, h_n = run(False)
            t_o, h_o = run(True)
        else:
            t_o, h_o = run(True)
            t_n, h_n = run(False)
        assert h_n == h_o, "results differ between variants!"
        wins += t_n < t_o
        print(
            f"pair {p + 1}: new {t_n}s vs old {t_o}s -> "
            f"{'NEW' if t_n < t_o else 'OLD'} (md5 identical)",
            flush=True,
        )
    print(f"new wins {wins}/{n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

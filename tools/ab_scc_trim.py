"""Interleaved A/B: strongly_connected_components trim=True vs trim=False.

One session, one persisted input per fixture, alternating pairs with a
discarded warm-up (the repo's noise-adjudication protocol — single-window
deltas below ~2x are unclassifiable on this host, so the two variants
must share noise conditions pair-wise).

Usage: python tools/ab_scc_trim.py [n_pairs]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from dachshund_spark.session import get_spark  # noqa: E402


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="ab_scc_trim",
        shuffle_partitions=32,
        extra={"spark.driver.memory": "20g"},
    )
    import __spark_entry__ as E  # noqa: E402
    from dachshund_spark.operators.components import (  # noqa: E402
        strongly_connected_components,
    )
    from dachshund_spark.oracles import page_targets  # noqa: E402

    n = 4000

    def band(v):
        return 0 if v < n // 4 else (1 if v < 3 * n // 4 else 2)

    banded = [
        (i, t)
        for i in range(n)
        for t in page_targets(i, n)
        if band(i) <= band(t)
        and ((band(i) == 1 and band(t) == 1) or i < t or band(i) != band(t))
    ]
    fixtures = {
        "event_sf001": E.event_cyc_edges(spark, "/root/testdata/sf0.01")
        .persist(),
        "banded_page_4k": spark.createDataFrame(
            banded, "src long, dst long"
        ).persist(),
    }
    for name, df in fixtures.items():
        df.count()

    def run(df, trim):
        t0 = time.time()
        out = strongly_connected_components(df, max_outer=80, trim=trim)
        cnt = out.count()
        return round(time.time() - t0, 1), cnt

    for name, df in fixtures.items():
        # discarded warm-up (JVM/code paths hot)
        wu = run(df, True)
        print(f"[{name}] warmup trim=True: {wu[0]}s ({wu[1]} rows)", flush=True)
        wins = 0
        for p in range(n_pairs):
            # alternate order within the window to cancel drift
            if p % 2 == 0:
                t_on, c_on = run(df, True)
                t_off, c_off = run(df, False)
            else:
                t_off, c_off = run(df, False)
                t_on, c_on = run(df, True)
            assert c_on == c_off, (c_on, c_off)
            wins += t_on < t_off
            print(
                f"[{name}] pair {p + 1}: trim=True {t_on}s vs "
                f"trim=False {t_off}s -> {'TRIM' if t_on < t_off else 'PEEL'}",
                flush=True,
            )
        print(f"[{name}] trim wins {wins}/{n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

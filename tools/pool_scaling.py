"""Pool valid interleaved scaling pairs across round BASELINE files and
print the pooled median — the cross-window protocol for the north rule's
scaling-efficiency criterion.

Single-window medians on this shared/burst host move ±0.05 between
sessions (BENCH/PLANS.md documents 1.5-2× ambient drift), so the headline
number is the median of ALL valid 256-partition pairs pooled across
rounds, each window co-sampled with its own pure-CPU host ceiling.

Usage: python tools/pool_scaling.py FILE.md [...] [--extra v1 v2 ...]
Parses the "All interleaved pairs" tables (rows ending "| yes |");
``--extra`` admits pairs recorded only in prose (round 4's three
256-partition pairs predate the table format — BASELINE_r04.md lines
100-104: 0.798 / 0.773 / 0.744; its TABLE rows are the old 64-partition
protocol and must NOT be pooled).  Prints the pooled list, median, count.
"""
import re
import sys


def pairs_from(path: str) -> list[float]:
    text = open(path).read()
    vals: list[float] = []
    # primary: rows of the interleaved-pairs table marked valid
    for m in re.finditer(
        r"^\|\s*\d+\s*\|[^|]+\|[^|]+\|[^|]+×\s*\|\s*([0-9.]+)\s*\|\s*yes\s*\|",
        text,
        re.M,
    ):
        vals.append(float(m.group(1)))
    return vals


def main():
    argv = sys.argv[1:]
    extra: list[float] = []
    if "--extra" in argv:
        i = argv.index("--extra")
        extra = [float(x) for x in argv[i + 1 :]]
        argv = argv[:i]
    files = argv
    if not files and not extra:
        sys.exit("usage: pool_scaling.py FILE.md [...] [--extra v1 v2 ...]")
    pooled: list[tuple[str, float]] = []
    for f in files:
        vs = pairs_from(f)
        print(f"{f}: {vs}")
        pooled += [(f, v) for v in vs]
    if extra:
        print(f"--extra: {extra}")
        pooled += [("--extra", v) for v in extra]
    if not pooled:
        sys.exit("no valid pairs found")
    vals = sorted(v for _, v in pooled)
    n = len(vals)
    med = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    print(f"pooled n={n} median={med:.3f} min={vals[0]:.3f} max={vals[-1]:.3f}")


if __name__ == "__main__":
    main()

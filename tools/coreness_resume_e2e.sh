#!/bin/bash
# End-to-end kill/resume evidence for the jobs-CLI coreness path
# (north_rule: "resumable from checkpoint with per-partition lineage +
# metrics").  Three CLI runs over the same edge parquet:
#   1. coreness --checkpoint-dir, SIGKILLed mid-cascade (after the first
#      durable checkpoint lands);
#   2. the SAME command again -> CheckpointManager.load_latest resumes
#      from the latest complete step (metrics sidecar present) and
#      finishes;
#   3. a clean run with no checkpoint dir.
# The transcript shows the checkpoint steps present after the kill, the
# steps appended by the resume, and that run-2 and run-3 outputs hash
# identically (sorted v,coreness md5).
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
WORK=$(mktemp -d /tmp/coreness_resume.XXXX)
SF_DIR=${1:-/root/testdata/sf0.01}
KILL_AFTER=${2:-45}

echo "== prepare: copurchase edge parquet from $SF_DIR =="
python - "$SF_DIR" "$WORK/edges.parquet" <<'EOF'
import sys
sys.path.insert(0, ".")
import __spark_entry__ as E
from dachshund_spark.session import get_spark

spark = get_spark(app_name="prep", extra={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
edges = E.copurchase_edges(spark, sys.argv[1])
edges.write.mode("overwrite").parquet(sys.argv[2])
print("edges:", spark.read.parquet(sys.argv[2]).count())
spark.stop()
EOF

CMD=(python -m dachshund_spark.jobs coreness
     --input "$WORK/edges.parquet" --output "$WORK/out_resumed.parquet"
     --checkpoint-dir "$WORK/ckpt")

echo
echo "== run 1: ${CMD[*]}  (SIGKILL after ${KILL_AFTER}s) =="
"${CMD[@]}" > "$WORK/run1.log" 2>&1 &
PID=$!
sleep "$KILL_AFTER"
kill -9 "$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "killed pid $PID after ${KILL_AFTER}s; checkpoint steps on disk:"
ls "$WORK/ckpt/coreness/" | sort -V | sed 's/^/  /'

echo
echo "== run 2: same command -> resume from latest complete step =="
time "${CMD[@]}"
echo "checkpoint steps after resume:"
ls "$WORK/ckpt/coreness/" | sort -V | sed 's/^/  /'

echo
echo "== run 3: clean run, no checkpoint =="
time python -m dachshund_spark.jobs coreness \
    --input "$WORK/edges.parquet" --output "$WORK/out_clean.parquet"

echo
echo "== compare: sorted (v,coreness) md5 =="
python - "$WORK/out_resumed.parquet" "$WORK/out_clean.parquet" <<'EOF'
import hashlib
import sys

import duckdb

def h(path):
    rows = duckdb.sql(
        f"SELECT v, coreness FROM '{path}/*.parquet' ORDER BY v"
    ).fetchall()
    m = hashlib.md5()
    for r in rows:
        m.update(repr(r).encode())
    return len(rows), m.hexdigest()

n1, h1 = h(sys.argv[1])
n2, h2 = h(sys.argv[2])
print(f"resumed: {n1} rows {h1}")
print(f"clean:   {n2} rows {h2}")
assert (n1, h1) == (n2, h2), "MISMATCH"
print("IDENTICAL")
EOF
STATUS=$?
rm -rf "$WORK"
exit $STATUS

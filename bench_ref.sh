#!/bin/bash
# Build the reference PgRC binary out-of-tree and measure its 8-thread
# compression throughput on the same synthetic input bench.py uses.
# Records build-ref/baseline.json for bench.py's vs_baseline.
set -e
cd "$(dirname "$0")"
mkdir -p build-ref
if [ ! -x build-ref/PgRC ]; then
  (cd build-ref && cmake /root/reference -DCMAKE_BUILD_TYPE=Release >/dev/null && make -j2 PgRC)
fi
N=${PGRC_BENCH_READS:-200000}
TMP=${PGRC_BENCH_TMP:-/tmp/pgrc_bench}
mkdir -p "$TMP"
SRC="$TMP/bench_${N}.fastq"
if [ ! -f "$SRC" ]; then
  PGRC_BENCH_READS=$N python - <<'EOF'
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath("bench.py")))
import bench
n = int(os.environ.get("PGRC_BENCH_READS", 200000))
tmp = os.environ.get("PGRC_BENCH_TMP", "/tmp/pgrc_bench")
bench.synth_fastq(os.path.join(tmp, f"bench_{n}.fastq"), n, 100, max(n*100//40, 200000), seed=7)
EOF
fi
START=$(date +%s.%N)
./build-ref/PgRC -t 8 -i "$SRC" "$TMP/ref.pgrc"
END=$(date +%s.%N)
DT=$(echo "$END - $START" | bc)
BASES=$((N * 100))
MBS=$(echo "scale=3; $BASES / 1000000 / $DT" | bc)
SIZE=$(stat -c %s "$TMP/ref.pgrc")
echo "{\"mbases_per_s\": $MBS, \"seconds\": $DT, \"archive_bytes\": $SIZE, \"reads\": $N}" > build-ref/baseline.json
cat build-ref/baseline.json

#!/bin/bash
# Round-5 TPU measurement batch (run serially — one chip).
# Usage: bash tools/run_r5_benches.sh <outfile>
set -u
OUT=${1:-/tmp/r5_benches.jsonl}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for fam in painn_ffdiv painn_2x2super_ffdiv painn_relaxed gan_relaxed \
           si_relaxed painn_2x2super_localrelax painn_8x8super \
           painn_8x8super_inc painn_6x6super_ffrelax; do
  timeout 3000 python tools/bench_all.py --families "$fam" >> "$OUT" 2>>"$OUT.err"
done
echo done >> "$OUT"

#!/usr/bin/env bash
# Knee-crossing measurement protocol (VERDICT r9 item 6: the tier /
# codec / memory / runs knobs used to live in NOTES command lines —
# this script IS the protocol, one command per phase, reproducible).
#
# Usage:
#   tools/knee_protocol.sh gen        # generate the tB=64 tiers
#   tools/knee_protocol.sh run OUT    # run KneeBench -> OUT (e.g. SCALE_r10_knee.json)
#
# Protocol (r10, targetBucket=64 — the second knee geometry; r9 ran the
# same code at tB=32 over x1m/x2p5m/x6m):
#   - tiers: x2p5m (2.5M vecs, FLAT side: 2.5M < 64*65536 = 4.19M),
#     x5mv (5M vecs, sharded), x10m (10M vecs, sharded) — the top pair
#     is sharded->sharded at ratio 2.0, both past the natural knee.
#   - SPARK_GRAFT_SHUFFLE_CODEC=zstd  (shuffle bytes are the single-host
#     wall; zstd cuts them ~25-40% vs lz4 — the r7 5M-tier protocol)
#   - SPARK_DRIVER_MEM=64g            (default 8g heap GC/spill-poisons
#     alphas — measured r7)
#   - SPARK_GRAFT_SCALE_RUNS=1        (single cold pass per tier; the
#     10M tier is ~1h, and min-of-2 would double a 3h campaign for a
#     statistic the top-pair alpha doesn't need at this ratio)
#   - KneeBench --tb=64 applies the same alpha <= ScaleBench.ContractAlpha
#     gate as ScaleBench (exit 2 on breach; NaN = breach).
# Generation uses plain java over the compiled classes (no sbt lock,
# so it can run while sbt edits/compiles continue) — run `sbt compile`
# first if src changed. KneeBench itself runs under sbt: launch
# DETACHED (nohup setsid ... & disown) and never concurrently with
# another sbt/bench process (lock + CPU contention poisons timings).
set -euo pipefail
cd "$(dirname "$0")/.."

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"

case "${1:-}" in
  gen)
    # docs tables are only warmup/ballast for KneeBench (it reads
    # embeddings alone) — sized n/10 like the r9 tiers
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x5mv 500000 5000000 32
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x10m 1000000 10000000 64
    ;;
  run)
    OUT="${2:?usage: knee_protocol.sh run OUT.json}"
    SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SCALE_RUNS=1 \
      sbt -batch "runMain graft.KneeBench $OUT --tb=64 scale/x2p5m scale/x5mv scale/x10m"
    ;;
  *)
    echo "usage: $0 gen | run OUT.json" >&2; exit 1;;
esac

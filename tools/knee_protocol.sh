#!/usr/bin/env bash
# Knee-crossing measurement protocol (VERDICT r9 item 6: the tier /
# codec / memory / runs knobs used to live in NOTES command lines —
# this script IS the protocol, one command per phase, reproducible).
#
# Usage:
#   tools/knee_protocol.sh gen        # generate the tB=48 tiers (+ x500k)
#   tools/knee_protocol.sh run OUT    # run KneeBench -> OUT (e.g. SCALE_r11_knee.json)
#   tools/knee_protocol.sh append OUT # run AppendProfile on x500k -> OUT
#
# r11 note: the r10 knee artifact carried a dirty SHA stamp (docs-only
# dirt, but the gate couldn't prove that mechanically — VERDICT r10
# item 1), so the SAME protocol re-runs on a clean tree; artifacts now
# stamp the dirty path LIST and tools/check_artifacts.py distinguishes
# dirty-docs (pass) from dirty-engine (fail). Run campaigns from a
# clean committed tree anyway: a clean stamp needs no judgment call.
#
# Protocol (r10, targetBucket=48 — the second knee geometry; r9 ran the
# same code at tB=32 over x1m/x2p5m/x6m):
#   - tiers: x2p5m (2.5M vecs, FLAT side: 2.5M < 48*65536 = 3.15M),
#     x4m (4M vecs, sharded), x8m (8M vecs, sharded) — the top pair
#     is sharded->sharded at ratio 2.0, both past the knee.
#   - WHY NOT tB=64 with a 10M top tier (the first r10 attempt): one
#     pass of the probes=20 chain at 10M vectors holds >61 GB of live
#     shuffle (the probe exchange ships ~probes x n int8 packs, and
#     every stage's output stays on disk until the job completes) —
#     measured ENOSPC on this sandbox's 62 GB free
#     (/tmp/knee_tb64_enospc.log; the 2.5M/5M tiers completed at
#     608/924 s before the 10M tier died). 8M vectors peak ~50-56 GB,
#     which fits with margin once the unused tiers are deleted. The
#     knee POSITION is a configuration constant (tB x 65,536); the
#     crossing machinery is identical at any tB — see KneeBench's
#     scaladoc.
#   - SPARK_GRAFT_SHUFFLE_CODEC=zstd  (shuffle bytes are the single-host
#     wall; zstd cuts them ~25-40% vs lz4 — the r7 5M-tier protocol)
#   - SPARK_DRIVER_MEM=64g            (default 8g heap GC/spill-poisons
#     alphas — measured r7)
#   - SPARK_GRAFT_SCALE_RUNS=1        (single cold pass per tier; the
#     8M tier is ~25-30 min, and min-of-2 would double the campaign for
#     a statistic the top-pair alpha doesn't need at ratio 2.0)
#   - KneeBench --tb=48 applies the same alpha <= ScaleBench.ContractAlpha
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
  gen-p5)
    # r12: the NATURAL tb=128 knee (8.39M vectors) crossed at reduced
    # probe budget — probes=5 quarters the ~150 GB probes=20 exchange
    # into this sandbox's scratch (NOTES_r11 §8; the alpha contract is
    # probes-invariant at fixed budget across tiers). Tiers 12M/24M are
    # both PAST the natural knee => sharded->sharded top pair at ratio
    # 2.0. Requires the x2p5m/x4m/x8m tiers deleted first (disk: the
    # 24M tier peak is ~36 GB tier + ~40 GB live shuffle).
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x12m 1200000 12000000 96
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x24m 2400000 24000000 192
    ;;
  run-p4)
    # x500k rides along as warmup + flat-branch witness (cheap); the
    # contract pair is x12m -> x24m, both sharded at tb=128.
    #
    # WHY probes=4, not 5 (the r12 scout, /tmp/scout_knee.log): the
    # probe budget maps to pCoarse=4 x pFine=ceil(probes/4) bucket-
    # probes, so probes=5 is EIGHT bucket-probes per vector — measured
    # ~40 GB of live shuffle at the 12M tier alone (the scout ENOSPC'd
    # there with 44 GB free), which puts the 24M pass at ~80 GB:
    # impossible on this scratch at any tier pair meaningfully past
    # the 8.39M natural knee. probes=4 is the next rung down the
    # ladder (pFine=1, 4 bucket-probes — the alpha contract is
    # probes-invariant at fixed budget across tiers), and
    # --reclaim=scale/x12m frees the measured 12M tier before the 24M
    # pass needs the headroom.
    OUT="${2:?usage: knee_protocol.sh run-p4 OUT.json}"
    SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SCALE_RUNS=1 \
      sbt -batch "runMain graft.KneeBench $OUT --tb=128 --probes=4 --reclaim=scale/x12m scale/x500k scale/x12m scale/x24m"
    ;;
  gen)
    # docs tables are only warmup/ballast for KneeBench (it reads
    # embeddings alone) — sized n/10 like the r9 tiers
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x2p5m 250000 2500000 32
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x4m 400000 4000000 32
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x8m 800000 8000000 64
    # the AppendProfile tier (500k vectors — the r10 append campaign's)
    java -Xmx24g $ADD_OPENS -Dspark.ui.enabled=false \
      -cp "$CP" graft.ScaleGen scale/x500k 50000 500000 32
    ;;
  run)
    OUT="${2:?usage: knee_protocol.sh run OUT.json}"
    SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SCALE_RUNS=1 \
      sbt -batch "runMain graft.KneeBench $OUT --tb=48 scale/x2p5m scale/x4m scale/x8m"
    ;;
  run-top)
    # top-pair variant: the x500k anchor replaces the 21-minute x2p5m
    # flat tier as warmup+flat-branch witness (the full flat anchor's
    # cold numbers live in SCALE_r11_knee_attempt2.log); the contract
    # pair is unchanged (x4m -> x8m, both sharded).
    OUT="${2:?usage: knee_protocol.sh run-top OUT.json}"
    SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_DRIVER_MEM=64g \
    SPARK_GRAFT_SCALE_RUNS=1 \
      sbt -batch "runMain graft.KneeBench $OUT --tb=48 scale/x500k scale/x4m scale/x8m"
    ;;
  append)
    OUT="${2:?usage: knee_protocol.sh append OUT.json}"
    SPARK_GRAFT_SHUFFLE_CODEC=zstd SPARK_DRIVER_MEM=64g \
      sbt -batch "runMain graft.AppendProfile $OUT scale/x500k"
    ;;
  *)
    echo "usage: $0 gen | run OUT.json | run-top OUT.json | append OUT.json" >&2; exit 1;;
esac

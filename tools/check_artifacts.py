#!/usr/bin/env python3
"""Round-end artifact discipline gate (VERDICT r8 item 3): every
benchmark artifact of the current round must embed the git SHA it was
measured on, and no code THAT ARTIFACT'S MEASUREMENT DEPENDS ON may
have changed between that SHA and HEAD — an artifact measured on older
code is not evidence about the shipped code. Committing the artifact
itself (and docs/logs) naturally moves HEAD, so the gate checks the
measured-SHA..HEAD diff rather than literal SHA equality.

An artifact depends on the ENGINE (everything under src/ except the
top-level bench mains, plus build config) and on its PRODUCING main.
A gate-metadata change inside another producer (e.g. widening
ScaleBench.ContractExempt) does not alter what a KneeBench binary
measured, so it must not invalidate the knee artifact. Known blind
spot, documented here: KneeBench reads ScaleBench.ContractAlpha — if
that CONSTANT ever changes, re-run the knee by hand.

Usage: tools/check_artifacts.py [glob ...]   (default: SCALE_r9*.json,
BENCH_FULL.json)
Exit 0 = every artifact's measured code state is HEAD's; 1 otherwise.
"""
import fnmatch
import glob
import json
import subprocess
import sys

DEFAULT = ["SCALE_r9*.json", "BENCH_FULL.json"]

# top-level harness mains: each affects only the artifacts it produces
MAINS = {
    "src/main/scala/graft/Bench.scala": ["BENCH_FULL.json", "BENCH_*.json"],
    # the SHA stamp itself: metadata on every artifact, input to none
    "src/main/scala/graft/BenchUtil.scala": [],
    "src/main/scala/graft/BenchOne.scala": [],
    "src/main/scala/graft/ScaleBench.scala": ["SCALE_r*_x5m.json",
                                              "SCALE_r*_sharded.json",
                                              "SCALE_r?.json"],
    "src/main/scala/graft/KneeBench.scala": ["SCALE_r*_knee.json"],
    "src/main/scala/graft/ScaleGen.scala": [],
    "src/main/scala/graft/SaltProfile.scala": [],
    "src/main/scala/graft/CosProfile.scala": [],
}


def run(*args):
    return subprocess.run(args, capture_output=True, text=True).stdout


def invalidating_changes(sha, artifact):
    out = run("git", "diff", "--name-only", f"{sha}..HEAD")
    bad = []
    for p in out.splitlines():
        if p in MAINS:
            if any(fnmatch.fnmatch(artifact, pat) for pat in MAINS[p]):
                bad.append(p)
        elif (p.startswith(("src/main/", "project/"))
              or p == "build.sbt"):  # tests can't change a measurement
            bad.append(p)
    return bad


head = run("git", "rev-parse", "HEAD").strip()
paths = sorted(p for g in (sys.argv[1:] or DEFAULT) for p in glob.glob(g))
bad = []
for p in paths:
    try:
        commit = json.load(open(p)).get("commit", "<absent>")
    except Exception as e:  # unparseable artifact is also a failure
        commit = f"<unreadable: {e}>"
    if commit.endswith("-dirty") or not all(
            c in "0123456789abcdef" for c in commit):
        print(f"FAIL {p}: commit {commit!r} (dirty or missing)")
        bad.append(p)
        continue
    changed = invalidating_changes(commit, p)
    if changed:
        print(f"FAIL {p}: measured-code change since {commit[:12]}: "
              f"{', '.join(changed[:5])}")
        bad.append(p)
    else:
        print(f"ok   {p}: {commit[:12]} (no measured-code change to HEAD)")
if not paths:
    print("FAIL: no artifacts matched", sys.argv[1:] or DEFAULT)
    sys.exit(1)
sys.exit(1 if bad else 0)

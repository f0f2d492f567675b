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

The gate also fails any artifact that COMMITS a contract violation
(VERDICT r9 item 8): a `contract_violations` list that is non-empty
means the measurement itself reported a breach — checking only SHA
drift would wave a red measurement through.

Usage: tools/check_artifacts.py [glob ...]   (default: SCALE_r10*.json,
BENCH_FULL.json)
Exit 0 = every artifact's measured code state is HEAD's and its
contract is clean; 1 otherwise.
"""
import fnmatch
import glob
import json
import subprocess
import sys

DEFAULT = ["SCALE_r10*.json", "BENCH_FULL.json"]

# top-level harness mains: each affects only the artifacts it produces.
# ScaleGen is mapped to every SCALE_* artifact (r9 ADVICE: a generator
# change regenerates tiers, which changes what any scale run measured;
# tiers generated under an OLDER ScaleGen and never regenerated would
# false-fail here — regenerate or re-run by hand in that case).
MAINS = {
    "src/main/scala/graft/Bench.scala": ["BENCH_FULL.json", "BENCH_*.json"],
    # the SHA stamp itself: metadata on every artifact, input to none
    "src/main/scala/graft/BenchUtil.scala": [],
    "src/main/scala/graft/BenchOne.scala": [],
    "src/main/scala/graft/ScaleBench.scala": ["SCALE_r*_x5m.json",
                                              "SCALE_r*_sharded.json",
                                              "SCALE_r?.json"],
    "src/main/scala/graft/KneeBench.scala": ["SCALE_r*_knee*.json"],
    "src/main/scala/graft/ScaleGen.scala": ["SCALE_r*.json"],
    "src/main/scala/graft/SaltProfile.scala": [],
    "src/main/scala/graft/CosProfile.scala": [],
    "src/main/scala/graft/ShardBatchProfile.scala": ["SCALE_r*_batch.json"],
    "src/main/scala/graft/AppendProfile.scala": ["SCALE_r*_append.json"],
}


def run(*args):
    """Run a git command; any failure (bad SHA, not a repo, missing
    binary) raises instead of returning empty output — the r9 advisor
    found the gate FAILING OPEN: a fabricated/rebased-away SHA made
    `git diff` error out, the empty stdout read as 'no changes', and
    the artifact printed ok."""
    r = subprocess.run(args, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(args)} failed ({r.returncode}): {r.stderr.strip()}")
    return r.stdout


def sha_in_repo(sha):
    """True iff `sha` names a commit object present in this repo."""
    r = subprocess.run(["git", "cat-file", "-e", f"{sha}^{{commit}}"],
                       capture_output=True, text=True)
    return r.returncode == 0


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
        doc = json.load(open(p))
        commit = doc.get("commit", "<absent>")
        violations = doc.get("contract_violations", [])
    except Exception as e:  # unparseable artifact is also a failure
        commit, violations = f"<unreadable: {e}>", []
    if commit.endswith("-dirty") or not all(
            c in "0123456789abcdef" for c in commit) or not commit:
        print(f"FAIL {p}: commit {commit!r} (dirty or missing)")
        bad.append(p)
        continue
    if not sha_in_repo(commit):
        print(f"FAIL {p}: commit {commit!r} is not a commit in this repo")
        bad.append(p)
        continue
    if violations:
        print(f"FAIL {p}: committed contract violations: {violations}")
        bad.append(p)
        continue
    try:
        changed = invalidating_changes(commit, p)
    except RuntimeError as e:
        print(f"FAIL {p}: git error: {e}")
        bad.append(p)
        continue
    if changed:
        print(f"FAIL {p}: measured-code change since {commit[:12]}: "
              f"{', '.join(changed[:5])}")
        bad.append(p)
    else:
        print(f"ok   {p}: {commit[:12]} (no measured-code change to HEAD, "
              "contract clean)")
if not paths:
    print("FAIL: no artifacts matched", sys.argv[1:] or DEFAULT)
    sys.exit(1)
sys.exit(1 if bad else 0)

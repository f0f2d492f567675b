#!/usr/bin/env python3
"""Round-end artifact discipline gate (VERDICT r8 item 3): every
benchmark artifact of the current round must embed the git SHA it was
measured on, and NO CODE may have changed between that SHA and HEAD —
an artifact measured on older code is not evidence about the shipped
code. Committing the artifact itself (and docs/logs) naturally moves
HEAD, so the gate checks the measured-SHA..HEAD diff for code paths
(src/, build.sbt, project/, tools/) rather than literal SHA equality.

Usage: tools/check_artifacts.py [glob ...]   (default: SCALE_r9*.json,
BENCH_FULL.json)
Exit 0 = every artifact's measured code state is HEAD's; 1 otherwise.
"""
import glob
import json
import subprocess
import sys

DEFAULT = ["SCALE_r9*.json", "BENCH_FULL.json"]
# the classpath that produces timings: src + build config. tools/ is
# harness-side (this gate, the oracle driver) and cannot change what a
# bench binary measured.
CODE_PREFIXES = ("src/", "project/")
CODE_FILES = ("build.sbt",)


def run(*args):
    return subprocess.run(args, capture_output=True, text=True).stdout


def code_changed_since(sha):
    out = run("git", "diff", "--name-only", f"{sha}..HEAD")
    return [p for p in out.splitlines()
            if p.startswith(CODE_PREFIXES) or p in CODE_FILES]


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
    changed = code_changed_since(commit)
    if changed:
        print(f"FAIL {p}: code changed since {commit[:12]}: "
              f"{', '.join(changed[:5])}")
        bad.append(p)
    else:
        print(f"ok   {p}: {commit[:12]} (no code change to HEAD)")
if not paths:
    print("FAIL: no artifacts matched", sys.argv[1:] or DEFAULT)
    sys.exit(1)
sys.exit(1 if bad else 0)

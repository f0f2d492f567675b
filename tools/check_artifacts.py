#!/usr/bin/env python3
"""Round-end artifact discipline gate (VERDICT r8 item 3): every
benchmark artifact of the current round must embed the git SHA it was
measured on, and that SHA must match HEAD — an artifact measured on
older code (or a dirty tree) is not evidence about the committed code.

Usage: tools/check_artifacts.py [glob ...]   (default: SCALE_r9*.json
KneeBench/Bench artifacts of the round, BENCH_FULL.json)
Exit 0 = all artifacts match HEAD; 1 = any missing/mismatched/dirty.
"""
import glob
import json
import subprocess
import sys

DEFAULT = ["SCALE_r9*.json", "BENCH_FULL.json"]

head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
paths = sorted(p for g in (sys.argv[1:] or DEFAULT) for p in glob.glob(g))
bad = []
for p in paths:
    try:
        commit = json.load(open(p)).get("commit", "<absent>")
    except Exception as e:  # unparseable artifact is also a failure
        commit = f"<unreadable: {e}>"
    ok = commit == head
    print(f"{'ok  ' if ok else 'FAIL'} {p}: {commit}" +
          ("" if ok else f" (HEAD {head})"))
    if not ok:
        bad.append(p)
if not paths:
    print("FAIL: no artifacts matched", sys.argv[1:] or DEFAULT)
    sys.exit(1)
sys.exit(1 if bad else 0)

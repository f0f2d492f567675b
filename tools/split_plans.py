#!/usr/bin/env python3
"""Split a graft.Explain log into per-query plan files.

Usage: split_plans.py <explain_log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for every `===== name =====`
section, with sbt's `[info] ` prefixes stripped.
"""
import re
import sys
import os

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
cur, buf = None, []


def flush():
    if cur and buf:
        with open(os.path.join(outdir, f"{cur}_{suffix}.txt"), "w") as f:
            f.write("\n".join(buf).rstrip() + "\n")


for raw in open(log, errors="replace"):
    line = raw.rstrip("\n")
    line = re.sub(r"^\[(info|error)\]\s?", "", line)
    m = re.match(r"^===== (\S+) =====$", line)
    if m:
        flush()
        cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
print(f"wrote plans to {outdir}")

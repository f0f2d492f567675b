#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify (Spark) into an output dir, then executes each oracle
SQL in DuckDB over the same parquet tables and diffs the results the way
the driver does: columns sorted by name, rows sorted, values compared.

Usage: python3 tools/local_verify.py [sfdir] [outdir] [--no-run] [--only q1,q2]
"""
import duckdb, json, sys, subprocess, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith('--') \
    else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith('--') \
    else '/tmp/verify_out'
only = None
for a in sys.argv:
    if a.startswith('--only'):
        only = set(a.split('=', 1)[1].split(','))

if '--no-run' not in sys.argv:
    r = subprocess.run(
        ['sbt', '-batch', f'runMain graft.Verify {sf} {out}'],
        cwd='/root/repo', capture_output=True, text=True)
    tail = '\n'.join((r.stdout + r.stderr).splitlines()[-30:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for ln in (r.stdout + r.stderr).splitlines():
        if '[verify]' in ln:
            print(ln)

con = duckdb.connect()
for p in sorted(glob.glob(f'{sf}/*.parquet')):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
n_ok = n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'FAIL {name}: {e}'); n_fail += 1; continue

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.astype(str)
        if len(df.columns):
            df = df.sort_values(list(df.columns))
        return df.reset_index(drop=True)

    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f'FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}')
        n_fail += 1
    elif len(g) != len(e):
        print(f'FAIL {name}: rows {len(g)} vs {len(e)}')
        n_fail += 1
    elif not g.equals(e):
        diff = (g != e).any(axis=1)
        idx = diff[diff].index[:3]
        print(f'FAIL {name}: {int(diff.sum())}/{len(g)} rows differ, e.g.:')
        for i in idx:
            print('  spark:', g.loc[i].to_dict())
            print('  duck :', e.loc[i].to_dict())
        n_fail += 1
    else:
        print(f'ok   {name} ({len(g)} rows)')
        n_ok += 1
print(f'== {n_ok} ok, {n_fail} fail ==')
sys.exit(1 if n_fail else 0)

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py [--sf1] [sf_dir] [verify_out] [only]

--sf1 (VERDICT r13 item 1): the bounded one-command decade-gate leg —
applies default DuckDB resource caps (GRAFT_DUCKDB_MEM, default 48GB;
GRAFT_DUCKDB_THREADS, default 16) and a spill dir with headroom, so
the replay spills instead of OOMing and can't fill the disk unnoticed
(it refuses to start under 20 GB free).
"""
import duckdb, json, sys
import pandas as pd

args = [a for a in sys.argv[1:] if a != '--sf1']
sf1_mode = '--sf1' in sys.argv[1:]
sf = args[0] if len(args) > 0 else '/root/testdata/sf0.001'
out = args[1] if len(args) > 1 else '/tmp/verify_out'
only = set(args[2].split(',')) if len(args) > 2 else None

con = duckdb.connect()
# Resource caps for the big synthetic-SF sweeps (default behavior
# unchanged for the driver): without a memory_limit DuckDB ballooned
# past 118 GB and OOM'd on the sf1 q01/q111 replays; with a cap +
# temp_directory it spills instead. --sf1 turns the caps ON with
# defaults; the env vars still override.
import os, shutil
mem = os.environ.get('GRAFT_DUCKDB_MEM') or ('48GB' if sf1_mode else None)
threads = os.environ.get('GRAFT_DUCKDB_THREADS') or ('16' if sf1_mode else None)
if mem:
    spill = os.environ.get('GRAFT_DUCKDB_SPILL', '/tmp/duckspill')
    os.makedirs(spill, exist_ok=True)
    if sf1_mode:
        free_gb = shutil.disk_usage(spill).free / 1e9
        if free_gb < 20:
            sys.exit(f'--sf1 refused: only {free_gb:.0f} GB free at {spill}; '
                     'need >= 20 GB spill headroom')
        con.execute("SET max_temp_directory_size='60GB'")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
if threads:
    con.execute(f"SET threads={int(threads)}")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
try:
    verify_errors = json.load(open(f'{out}/_errors.json'))
except Exception:
    verify_errors = {}
for name, err in sorted(verify_errors.items()):
    print(f'{name}: VERIFY-ERR {err[:200]}')
    fails += 1
for name, sql in sorted(oracle.items()):
    if name in verify_errors:
        continue
    if only is not None and name not in only:
        continue
    try:
        spark_df = pd.read_parquet(f'{out}/{name}')
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f'{name}: ERROR {e}')
        fails += 1
        continue

    def norm(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(by=list(df.columns), na_position='first').reset_index(drop=True)
    s, k = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(k.columns) or s.shape != k.shape:
        print(f'{name}: SHAPE/COLS MISMATCH spark={s.shape}{list(s.columns)} duck={k.shape}{list(k.columns)}')
        fails += 1
        continue
    bad_cols = []
    for c in s.columns:
        a, b = s[c], k[c]
        if str(a.dtype) != str(b.dtype):
            bad_cols.append(f'{c}:dtype {a.dtype}!={b.dtype}')
            continue
        if a.dtype.kind == 'f':
            eq = (a.fillna(-9e9) - b.fillna(-9e9)).abs() < 1e-12
            # the driver hashes RENDERED values: -0.0 != 0.0 there even
            # though the numeric diff is 0 (bit q383 in round 16)
            import numpy as np
            az, bz = a.to_numpy(), b.to_numpy()
            signed_zero_diff = (az == 0.0) & (bz == 0.0) & \
                (np.signbit(az) != np.signbit(bz))
            eq = eq & ~signed_zero_diff
        else:
            eq = a.astype('object').where(a.notna(), None) == b.astype('object').where(b.notna(), None)
            eq = eq | (a.isna() & b.isna())
        if (~eq).any():
            i = (~eq).idxmax()
            bad_cols.append(f'{c}: {int((~eq).sum())} bad, e.g. row {i}: {s.iloc[i].to_dict()} vs {k.iloc[i].to_dict()}')
    if bad_cols:
        print(f'{name}: VALUE MISMATCH ' + ' | '.join(bad_cols[:3]))
        fails += 1
    else:
        print(f'{name}: MATCH rows={s.shape[0]}')
sys.exit(1 if fails else 0)

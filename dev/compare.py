#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and diff against the Verify.scala parquet dumps.
Dev-only tooling (driver-side python); not part of the Scala library."""
import duckdb, json, sys
import pandas as pd

sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        o = con.execute(sql).fetchdf()
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        if list(o.columns) != list(s.columns):
            fails.append((name, 'schema', list(o.columns), list(s.columns))); continue
        if len(o) != len(s):
            fails.append((name, 'rows', len(o), len(s))); continue
        cols = [c for c in o.columns]
        o = o.sort_values(by=cols, kind='mergesort').reset_index(drop=True)
        s = s.sort_values(by=cols, kind='mergesort').reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        except AssertionError as e:
            fails.append((name, 'values', str(e).replace('\n', ' | ')[:300]))
    except Exception as e:
        fails.append((name, 'err', str(e)[:250]))
print(f'checked {len(oracle)} queries, FAILS: {len(fails)}')
for f in fails: print(f)

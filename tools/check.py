#!/usr/bin/env python3
"""Local pre-validation mirroring the driver's DuckDB-oracle compare.

Usage: tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> spark-written parquet, runs the matching oracle SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, sorts columns
by name, sorts rows, and compares values (exact, with a report of any
float-level diffs). Dev tooling only — not part of the library.
"""
import sys, json, glob, os, math, decimal
import duckdb
import numpy as np
import pandas as pd

def driver_fragility(df, side):
    """Driver-faithful canonicalization probe (VERDICT r7 item 5).

    The driver normalizes results through pandas: columns sorted by
    name, rows sorted by ALL columns via DataFrame.sort_values, values
    hashed through the float64/int64 client path. Two output shapes
    survive a value-level compare but break there:
      - container-typed cells (list/ndarray/dict): sort_values builds a
        Categorical over the column and crashes on unhashable values
        (r7 q_text_inverted);
      - Decimal cells that lose precision through float64 (>15-16
        significant digits): the two engines' client serializations
        diverge even when the values are identical (r7
        q_profile_checksum).
    Returns a list of fatal fragility strings (empty = driver-safe).
    """
    fatal = []
    for c in df.columns:
        if df[c].dtype != object:
            continue
        # scan EVERY value (r8 ADVICE: a fragile cell past row 200 must
        # not escape the probe) — a vectorized isinstance map is cheap
        # at these result sizes
        col = df[c].dropna()
        if col.map(lambda v: isinstance(v, (list, tuple, dict,
                                            np.ndarray))).any():
            fatal.append(f"{side} column {c}: unhashable container "
                         f"breaks driver sort_values")
            continue
        for v in col[col.map(lambda v: isinstance(v, decimal.Decimal))]:
            try:
                roundtrip = decimal.Decimal(repr(float(v)))
            except (OverflowError, ValueError):
                roundtrip = None
            if roundtrip is None or roundtrip != v:
                fatal.append(f"{side} column {c}: decimal {v} does not "
                             f"round-trip float64 (driver hash unstable)")
                break
    if not fatal:
        try:
            df[sorted(df.columns)].sort_values(by=sorted(df.columns))
        except Exception as e:
            fatal.append(f"{side}: driver-style sort_values raises "
                         f"{type(e).__name__}: {e}")
    return fatal

def typenorm(t):
    """Collapse only spellings that serialize identically; keep width."""
    t = t.upper()
    return {"TIMESTAMP_NS": "TIMESTAMP", "TIMESTAMP_MS": "TIMESTAMP",
            "TIMESTAMP WITH TIME ZONE": "TIMESTAMP"}.get(t, t)

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(('f', v))
            elif v is None:
                rr.append(('n',))
            else:
                rr.append(('v', str(v)))
        out.append(tuple(rr))
    out.sort(key=lambda t: str(t))
    return out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written multi-file table (e.g. sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"NODATA {name}"); n_fail += 1; continue
        grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        cols, gtypes_raw = list(grel.columns), [str(t) for t in grel.types]
        got = grel.fetchall()
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        got = [[r[i] for i in order] for r in got]
        gcols = sorted(cols)
        gtypes = [gtypes_raw[i] for i in order]
        if name not in oracle:
            print(f"NO-ORACLE {name}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            erel = con.sql(oracle[name])
            ecols, etypes_raw = list(erel.columns), [str(t) for t in erel.types]
            exp = erel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        eorder = sorted(range(len(ecols)), key=lambda i: ecols[i])
        exp = [[r[i] for i in eorder] for r in exp]
        secols = sorted(ecols)
        etypes = [etypes_raw[i] for i in eorder]
        if gcols != secols:
            print(f"FAIL {name}: columns {gcols} != {secols}"); n_fail += 1; continue
        # Type-faithful compare: Python fetchall() silently widens DuckDB
        # HUGEINT/int128 to int, so a value-only compare passes where the
        # driver's serialization-level hash fails. Fail on any declared
        # type drift between the Spark parquet and the oracle relation.
        drift = [(c, gt, et) for c, gt, et in zip(gcols, gtypes, etypes)
                 if typenorm(gt) != typenorm(et)]
        if drift:
            for c, gt, et in drift:
                print(f"TYPE-DRIFT {name}: {c}: spark={gt} oracle={et}")
            n_fail += 1
            continue
        # r10 driver-hash class (VERDICT r10 item 1, r11 forensics): the
        # driver's two client paths serialize DECIMAL cells differently —
        # one renders str(Decimal) (fixed scale: '320042.90',
        # '117331127612745'), the other repr(float64) ('320042.9',
        # '117331127612745.0') — so the hash diverges for any cell where
        # those strings differ, even when values AND declared types match
        # bit-for-bit. Verified against r10 outputs: the 4 hash-reds
        # (q_cdc_merge, q_cluster_kmeans/pq/pq_search) each had >=4 such
        # cells; the 2 hash-green DECIMAL queries (q_agg_weighted_median,
        # q_attribution) had exactly zero — i.e. they were one
        # trailing-zero-cents row away from red. Any DECIMAL output column
        # is therefore fatal here: keep decimals internal and cast ONCE to
        # DOUBLE (or BIGINT when provably bounded) at the output boundary.
        decs = [(c, gt) for c, gt in zip(gcols, gtypes) if "DECIMAL" in gt]
        if decs:
            for c, gt in decs:
                print(f"DRIVER-FRAGILE {name}: output column {c} declared "
                      f"{gt} (DECIMAL outputs hash-diverge in the driver)")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        # driver-faithful pandas probe on BOTH result sets, built from the
        # ALREADY-FETCHED rows (no re-execution; fetchall preserves the
        # probe-relevant cell types — Decimals and containers stay object)
        frag = (driver_fragility(pd.DataFrame(got, columns=gcols), "spark")
                + driver_fragility(pd.DataFrame(exp, columns=secols), "oracle"))
        if frag:
            for f in frag:
                print(f"DRIVER-FRAGILE {name}: {f}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if gr != er:
                # float tolerance diagnosis
                close = all(
                    (a == b) or (a[0] == 'f' and b[0] == 'f' and
                                 math.isclose(a[1], b[1], rel_tol=1e-9, abs_tol=1e-9))
                    for a, b in zip(gr, er))
                bad = (i, gr, er, close)
                break
        if bad is None:
            print(f"PASS {name}: rows={len(got)}"); n_pass += 1
        else:
            i, gr, er, close = bad
            tag = "FLOAT-CLOSE" if close else "FAIL"
            print(f"{tag} {name}: row {i}\n  got {gr}\n  exp {er}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

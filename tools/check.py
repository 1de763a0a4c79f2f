#!/usr/bin/env python3
"""Local pre-validation mirroring the driver's DuckDB-oracle compare.

Usage: tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> spark-written parquet, runs the matching oracle SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, sorts columns
by name, sorts rows, and compares values (exact, with a report of any
float-level diffs). Dev tooling only — not part of the library.
"""
import sys, json, glob, os, math
import duckdb

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
        if os.path.exists(p):
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
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
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

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the testdata parquet tables,
compare row sets (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    import datetime, decimal, math
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; fails.append(name); continue
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: empty spark output dir"); n_fail += 1; fails.append(name); continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        sc, srows = canon(sdf, scols)
        oc, orows = canon(odf, ocols)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            print(f"FAIL {name}: schema {sc} vs {oc}"); n_fail += 1; fails.append(name); continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1; fails.append(name); continue
        if srows != orows:
            bad = next(i for i in range(len(srows)) if srows[i] != orows[i])
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  oracle: {orows[bad]}")
            n_fail += 1; fails.append(name); continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if fails:
        print("failed:", " ".join(fails))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

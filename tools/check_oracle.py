#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs
each oracle SQL in DuckDB against the sf parquet tables, and compares:
row count, column names (sorted), and a hash over values with columns
sorted by name. Driver-side tooling only — NOT part of the Scala library.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)

def df_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

def main(verify_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:
            print(f"[warn] view {t}: {e}")
    oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
    ok, bad = 0, 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{verify_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            bad += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            bad += 1
            continue
        rows_match = len(sdf) == len(odf)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = schema_match and df_hash(sdf, scols) == df_hash(odf, ocols)
        if rows_match and schema_match and hash_match:
            ok += 1
            print(f"OK   {name} ({len(sdf)} rows)")
        else:
            bad += 1
            print(f"FAIL {name}: rows {len(sdf)}v{len(odf)} schema {sorted(scols)}v{sorted(ocols)} hash={hash_match}")
            if rows_match and schema_match:
                for i, (a, b) in enumerate(zip(sdf, odf)):
                    na = [norm(x) for x in a]
                    nb = [norm(x) for x in b]
                    if na != nb:
                        print(f"     first diff row {i}: spark={a} oracle={b}")
                        break
    print(f"\n{ok} OK, {bad} FAIL")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/verify_local.py <outDir> [sfDir]

Assumes graft.Verify has already been run:
  sbt "runMain graft.Verify <sfDir> <outDir>"
Then for each <outDir>/<name> parquet dir + oracle_sql.json entry, runs the
oracle SQL in DuckDB over the sfDir tables and compares (columns sorted by
name, rows sorted, values hashed) like the driver does.
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Values come through pandas (like the driver's compare), so DuckDB
    # HUGEINT/DECIMAL arrive as float64 — an oracle emitting SUM(BIGINT)
    # un-cast will mismatch a Spark long ("3.0" vs "3"). Keep that visible.
    if v is None or v != v:  # None or NaN
        return "NULL"
    if isinstance(v, float):
        # repr of float is exact; driver likely compares similarly
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def fetch(rel):
    """Columns + rows via pandas, mirroring the driver's conversion."""
    df = rel.df()
    return list(df.columns), list(df.itertuples(index=False, name=None))


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    results = sorted(d for d in glob.glob(os.path.join(out_dir, "*"))
                     if os.path.isdir(d))
    for d in results:
        name = os.path.basename(d)
        s_cols, s_rows = fetch(con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')"))
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(s_rows)} rows) "
                  f"{'OK' if len(s_rows) > 0 else 'EMPTY!'}")
            continue
        try:
            o_cols, o_rows = fetch(con.sql(oracle[name]))
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        schema_ok = sorted(map(str.lower, s_cols)) == sorted(map(str.lower, o_cols))
        hash_ok = table_hash(s_rows, [c.lower() for c in s_cols]) == \
            table_hash(o_rows, [c.lower() for c in o_cols])
        rows_ok = len(s_rows) == len(o_rows)
        if schema_ok and hash_ok and rows_ok:
            print(f"  ✓ {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  ✗ {name}: schema={schema_ok} rows={len(s_rows)}/{len(o_rows)} hash={hash_ok}")
            if not schema_ok:
                print(f"      spark cols:  {sorted(s_cols)}")
                print(f"      oracle cols: {sorted(o_cols)}")
            elif not hash_ok:
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i].lower())
                ss = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in s_rows)
                oo = sorted("\x1f".join(canon(r[i]) for i in order_o) for r in o_rows)
                shown = 0
                for a, b in zip(ss, oo):
                    if a != b and shown < 3:
                        print(f"      spark : {a[:200]}")
                        print(f"      oracle: {b[:200]}")
                        shown += 1
    print(f"PASS {n_pass} FAIL {n_fail} "
          f"(+{len(results) - n_pass - n_fail} rows-only)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

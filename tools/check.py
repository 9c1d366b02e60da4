#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB (with views over
the sfDir parquet tables), reads the Spark result parquet from outDir/<name>,
and compares values column-name-sorted, row-order-insensitive (sorted by all
columns). Usage: tools/check.py <sfDir> <outDir> [query...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({files})")
        sp_cols = [d[0] for d in sq.description]
        sp_rows = sq.fetchall()
        # driver sorts columns by name before hashing
        didx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        sidx = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {name}: columns differ spark={sorted(sp_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        d = norm([[r[i] for i in didx] for r in duck_rows])
        s = norm([[r[i] for i in sidx] for r in sp_rows])
        if d == s:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            for a, b in diff:
                print(f"  spark: {a}\n  duck : {b}")
            onlys = [r for r in s if r not in set(d)][:2]
            onlyd = [r for r in d if r not in set(s)][:2]
            if onlys:
                print(f"  only-spark: {onlys}")
            if onlyd:
                print(f"  only-duck : {onlyd}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

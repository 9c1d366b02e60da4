#!/usr/bin/env python3
"""Cross-engine output-TYPE audit for every oracle query.

The round-10 lesson: the driver's correctness gate compares STRINGIFIED
values, and its result bridge renders engine types differently than the
local fetchall() replica — DuckDB types a bare SUM(BIGINT) as HUGEINT,
which a pandas/arrow bridge renders "475.0" against Spark's "475". That
class of bug is VALUE-INDEPENDENT and therefore sweepable without running
the driver: for each query, compare the DuckDB result column type families
(DESCRIBE <oracle sql>) against the Spark output parquet's schema, and
separately flag any HUGEINT-typed oracle output (the known-dangerous type
even when the Spark side agrees it's an integer).

Usage: tools/typecheck.py <sfDir> <outDir> [query...]
(outDir = a Verify dump; optional query names restrict the audit, matching
check.py — a partial dump audited without the subset list flags every
missing output loudly by design.)
Exit 1 on any mismatch or HUGEINT output.
"""
import sys, json, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES  # one source of truth for the table list


def fam(ty):
    t = ty.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "STRING", "BLOB"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if "TIMESTAMP" in t or t == "DATE":
        return "time"
    return t


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    # a typo'd/removed subset name would otherwise be silently skipped and
    # the run would print "0 flagged" while auditing nothing — fail loudly
    # like the MISS path does
    unknown = only - set(oracle)
    for name in sorted(unknown):
        print(f"MISS {name}: not an oracle_sql.json query name — nothing audited")
        bad += 1
    n_checked = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        n_checked += 1
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            bad += 1
            continue
        huge = [c for c, ty, *_ in desc if "HUGEINT" in ty.upper()]
        if huge:
            print(f"HUGE {name}: uncast integer SUM output columns {huge}")
            bad += 1
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # a silent skip here would report "0 flagged" for exactly the
            # query being audited — fail loudly like check.py does
            print(f"MISS {name}: no spark output parquet under {out_dir}/{name} "
                  "(Verify failed or partial dump) — family check not run")
            bad += 1
            continue
        # bind the path list as a parameter: interpolating the Python list
        # repr happens to parse as a DuckDB list literal but breaks on any
        # path containing a quote or other special character
        sdesc = {c: fam(ty) for c, ty, *_ in con.execute(
            "DESCRIBE SELECT * FROM read_parquet(?)", [files]).fetchall()}
        ddesc = {c: fam(ty) for c, ty, *_ in desc}
        diffs = [(c, sdesc.get(c), d) for c, d in ddesc.items()
                 if sdesc.get(c) != d]
        if diffs:
            print(f"TYPE {name}: spark-vs-duckdb family mismatch {diffs}")
            bad += 1
    print(f"== {n_checked} queries, {bad} flagged ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

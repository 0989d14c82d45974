#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential oracle.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result, run
the matching oracle SQL in DuckDB against the sfDir tables, and compare as
(column-name-sorted, row-sorted) value matrices. Purely a dev-loop tool —
the real gate is the driver's CORRECTNESS_r{N}.json.
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name, stringify values with float rounding tolerance
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # exact: the driver hash-compares values, so last-bit float
                # differences are real failures
                if math.isnan(v): vals.append("nan")
                else: vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    dumped = {n for n in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, n))}
    # an oracle whose Spark dump is missing means the Spark side failed —
    # count it as a failure instead of silently skipping it
    for name in sorted(set(oracles) - dumped):
        print(f"  ✗ {name}: NO SPARK DUMP (query failed?)")
        n_fail += 1
    for name in sorted(dumped):
        d = os.path.join(out_dir, name)
        got_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if sorted(got_rel.columns) != sorted(exp_rel.columns):
            print(f"  ✗ {name}: COLUMNS {sorted(got_rel.columns)} vs {sorted(exp_rel.columns)}")
            n_fail += 1
            continue
        # the driver's hash is type-sensitive: repr(HUGEINT 5) == repr(BIGINT 5)
        # hides type drift, so compare DuckDB-visible column types too (the
        # Spark side reads back through parquet → BIGINT; an uncast DuckDB
        # sum() → HUGEINT must fail here the way the driver's hash fails)
        got_t = dict(zip(got_rel.columns, (str(t) for t in got_rel.types)))
        exp_t = dict(zip(exp_rel.columns, (str(t) for t in exp_rel.types)))
        bad_t = {c: (got_t[c], exp_t[c]) for c in got_t if got_t[c] != exp_t[c]}
        if bad_t:
            print(f"  ✗ {name}: TYPES spark-vs-oracle {bad_t}")
            n_fail += 1
        elif got == exp:
            print(f"  ✓ {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
            diff_g = [r for r in got if r not in set(exp)][:3]
            diff_e = [r for r in exp if r not in set(got)][:3]
            print(f"  ✗ {name}: {len(got)} vs {len(exp)} rows; spark-only={diff_g} oracle-only={diff_e}")
    print(f"PASS {n_pass} / FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

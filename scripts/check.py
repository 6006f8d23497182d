#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name then rows, and compares values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        c = []
        for v in r:
            if isinstance(v, float):
                c.append(f"{v:.6g}")
            elif isinstance(v, bytes):
                c.append(v.hex())
            elif isinstance(v, list):
                c.append(json.dumps([f"{x:.6g}" if isinstance(x, float) else x for x in v]))
            else:
                c.append(str(v))
        out.append(tuple(c))
    return sorted(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = canon(con.sql(
            f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall())
        if name not in oracles:
            print(f"SKIP {name}: rows-only check -> {len(spark_rows)} rows"
                  + (" (EMPTY!)" if not spark_rows else ""))
            continue
        try:
            oracle_rel = con.sql(oracles[name])
            # int128-class output ban (r14's e24/e27/gr8: HUGEINT/wide-
            # decimal columns canonicalize differently across the driver's
            # engines, so a CORRECT answer fails the hash) — the DuckDB
            # mirror of Verify.assertDriverSafe's DecimalType(>18) wall
            wide = [(c, t) for c, t in zip(oracle_rel.columns,
                                           map(str, oracle_rel.types))
                    if t in ("HUGEINT", "UHUGEINT")
                    or (t.startswith("DECIMAL(")
                        and int(t.split("(")[1].split(",")[0]) > 18)]
            if wide:
                print(f"FAIL {name}: int128-class oracle output columns "
                      f"{wide} - cast to BIGINT (bounded), a ratio, or "
                      f"VARCHAR on BOTH sides")
                n_fail += 1
                continue
            ocols = sorted(oracle_rel.columns)
            orows = canon(con.sql(
                f"SELECT {', '.join(ocols)} FROM oracle_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_cols != ocols:
            print(f"FAIL {name}: columns {spark_cols} != {ocols}")
            n_fail += 1
        elif spark_rows != orows:
            diff = [(a, b) for a, b in zip(spark_rows, orows) if a != b]
            print(f"FAIL {name}: {len(spark_rows)} vs {len(orows)} rows; "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query negative-control matrix (r14 verdict ask #4).

Usage: python3 scripts/control_matrix.py <outDir> <rightSf> <wrongSf> [out.json]

For every registry query in <outDir> (a graft.Verify dump produced at
<rightSf>), replays the oracle twice: against <rightSf> (must MATCH — the
ordinary gate) and against <wrongSf> (must MISMATCH — the per-query negative
control). A query that matches on the WRONG data could never catch a
data-pipeline mix-up, so every such row must either carry the in-band corpus
fixture tag (graft.Tables.corpusTag / OracleTag — SparkEntry.controlTagged)
or be explained here. Exit 1 if any row is green on the wrong sf.
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
            else:
                c.append(str(v))
        out.append(tuple(c))
    return sorted(out)


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def oracle_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    return cols, canon(con.sql(
        f"SELECT {', '.join(cols)} FROM rel").fetchall())


def main():
    out_dir, right_sf, wrong_sf = sys.argv[1], sys.argv[2], sys.argv[3]
    dest = sys.argv[4] if len(sys.argv) > 4 else "CONTROL_MATRIX.json"
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con_r, con_w = connect(right_sf), connect(wrong_sf)
    matrix, stuck = {}, []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or not glob.glob(f"{d}/*.parquet"):
            continue
        spark_rel = con_r.sql(f"SELECT * FROM '{d}/*.parquet'")
        scols = sorted(spark_rel.columns)
        srows = canon(con_r.sql(
            f"SELECT {', '.join(scols)} FROM spark_rel").fetchall())
        if name not in oracles:
            matrix[name] = {"right": "no-oracle", "wrong_sf_control": "n/a"}
            continue
        try:
            rc, rr = oracle_rows(con_r, oracles[name])
            right = "match" if (rc == scols and rr == srows) else "MISMATCH"
        except Exception as e:
            right = f"oracle-error: {e}"
        try:
            wc, wr = oracle_rows(con_w, oracles[name])
            flips = not (wc == scols and wr == srows)
        except Exception:
            flips = True  # a loud oracle error on wrong data is a flip
        matrix[name] = {"right": right,
                        "wrong_sf_control": "flips" if flips else "STUCK"}
        if right != "match" or not flips:
            stuck.append(name)
    json.dump({"right_sf": right_sf, "wrong_sf": wrong_sf,
               "queries": matrix,
               "n": len(matrix),
               "stuck": [s for s in stuck
                         if matrix[s]["wrong_sf_control"] == "STUCK"],
               "red_on_right": [s for s in stuck
                                if matrix[s]["right"] != "match"]},
              open(dest, "w"), indent=1)
    n_flip = sum(1 for v in matrix.values()
                 if v["wrong_sf_control"] == "flips")
    print(f"== {len(matrix)} rows: {n_flip} flip on wrong-sf, "
          f"{len(stuck)} problem rows -> {dest}")
    for s in stuck:
        print(f"  PROBLEM {s}: {matrix[s]}")
    sys.exit(1 if stuck else 0)


if __name__ == "__main__":
    main()

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage (SURVEY §2.6 listing/aggregation + the
  * Catalyst paths every other operator rides on).
  *
  * Each query returns a deterministically-ordered DataFrame whose column
  * names match its oracle SQL exactly (driver hash-compares after sorting
  * columns by name). Float aggregates are rounded so double summation-order
  * differences between Spark and DuckDB cannot flip the hash.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => q1Agg(s, dir)),
    "q2_join3" -> ((s, dir) => q2Join3(s, dir)),
    "z1_zorder_layout" -> ((s, dir) => zorderLayout(s, dir)),
    "z2_hilbert_layout" -> ((s, dir) => hilbertLayout(s, dir)),
    "q3_rollup" -> ((s, dir) => rollupAgg(s, dir)),
    "q4_skew_report" -> ((s, dir) => skewReportQ(s, dir)),
    "q6_hll" -> ((s, dir) => hllQ(s, dir)),
    "q7_hdr_quantiles" -> ((s, dir) => hdrQuantilesQ(s, dir)),
    "q9_kmv_overlap" -> ((s, dir) => kmvOverlapQ(s, dir))
  )

  /** [[graft.operators.Sketches.kmvOverlap]] over word-3-gram shingles of
    * documents split into three corpus snapshots by doc_id mod 3 —
    * ~10k distinct grams per snapshot at sf0.01, so every per-corpus and
    * union sketch rides the ESTIMATION branch (kth-value division), not
    * the exhaustive one, and the three pair rows carry genuine non-zero
    * overlap (the synthetic vocabulary is small, so snapshots share
    * grams). The exact twins in the same row are the oracle's anchor. */
  def kmvOverlapQ(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir).select(
      concat(lit("c"), pmod(col("doc_id"), lit(3))).as("corpus"),
      explode(graft.functions.text.word_shingles(col("text"), 3)).as("gram"))
    graft.operators.Sketches.kmvOverlap(grams, "corpus", "gram", k = 256)
      .orderBy("corpus_a", "corpus_b")
  }

  /** [[graft.operators.Sketches.hdrQuantiles]] over lineitem price cents
    * keyed by return flag — three keys × p50/p90/p99 with a real value
    * spread (cents span ~90k..10.5M at sf0.01, so every bucket rides the
    * log-linear branch and max_err is a genuine 2^e−1, not zero). The
    * spec pins the error bound against exact nearest-rank percentiles;
    * this row pins the full bucket→cumulative→read-out replay. */
  def hdrQuantilesQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.hdrQuantiles(
        Tables.lineitem(spark, dir).select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents")
      .orderBy("l_returnflag", "q_pct")

  /** [[graft.operators.Sketches.hllCardinality]] over three lineitem key
    * columns spanning the sketch's regimes at sf0.01: l_orderkey (~15k
    * distinct — raw HLL, err ≈ 4%), l_partkey (2k — raw, ≈ 5%),
    * l_suppkey (100 — the linear-counting branch, ≈ 2%). Every register,
    * both estimate branches, and the exact twin replay in the oracle. */
  def hllQ(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    // (r18 probe: wrapping this union in Tables.scaled measured WORSE —
    // 2.44 → 3.65 s — the keyless repartition's sort+shuffle of 1.8M rows
    // costs more than the 3-task scan limit does; left as-is)
    val keyed = li.select(lit("l_orderkey").as("col_name"),
        col("l_orderkey").cast("string").as("k"))
      .unionAll(li.select(lit("l_partkey").as("col_name"),
        col("l_partkey").cast("string").as("k")))
      .unionAll(li.select(lit("l_suppkey").as("col_name"),
        col("l_suppkey").cast("string").as("k")))
    graft.operators.Sketches.hllCardinality(keyed, "col_name", "k")
      .orderBy("col_name")
  }

  /** Join-key skew diagnostic over the events stream with a PLANTED hot
    * key (every user_id % 3 == 0 collapses to key 0 — one key carrying a
    * third of all rows): top-10 hottest keys + exact nearest-rank
    * p50/p99 of the count distribution + the suggested salt factor.
    * Output columns avoid SQL keywords (top_rank/ukey) — the driver
    * interpolates names unquoted. */
  def skewReportQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.skewReport(
        Tables.events(spark, dir).select(
          when(col("user_id") % 3 === 0, 0L).otherwise(col("user_id"))
            .as("ukey")),
        "ukey", k = 10)
      .select(col("rank").as("top_rank"), col("key").as("ukey"), col("cnt"),
        col("n_keys"), col("n_rows"), col("max_count"),
        col("p50_count"), col("p99_count"), col("suggested_salt"))
      .orderBy("top_rank")

  /** ROLLUP aggregation (multi-level subtotals in ONE pass — Catalyst
    * expands grouping sets map-side, so the grand total costs no second
    * scan): per (returnflag, linestatus), per returnflag, and overall,
    * with grouping_id disambiguating subtotal levels from genuine nulls. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("gid").cast("long").as("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** Hilbert layout summary — z1's geometry on the Hilbert index (the
    * no-seam-jump curve: tighter per-bucket bboxes at the same bucket
    * count, LayoutSpec measures the win). Same normalization, same
    * per-bucket bounds shape; the Column fold and the oracle CTE chain
    * come from the same level schedule
    * ([[graft.operators.Layout.hilbertSqlCtes]]). */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val l = Tables.lineitem(spark, dir)
    val r = l.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val n = l
      .withColumn("na", Layout.byteRank("l_partkey", r.getLong(0), r.getLong(1)))
      .withColumn("nb", Layout.byteRank("l_suppkey", r.getLong(2), r.getLong(3)))
    Layout.hilbertBuckets(n, "na", "nb", bits = 8, log2Buckets = 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("a_min"), max("l_partkey").as("a_max"),
        min("l_suppkey").as("b_min"), max("l_suppkey").as("b_max"))
      .orderBy("bucket")
  }

  /** Z-order layout summary over lineitem (l_partkey, l_suppkey): both keys
    * min-max normalized to 8-bit ranks (integer-exact), Morton-interleaved,
    * bucketed into 16 z-ranges; per bucket, row count + min/max of BOTH
    * original dimensions — the bounded-in-both-columns geometry that makes
    * parquet min/max stats prune on either predicate. The z-key fold and
    * the oracle string come from the same generator
    * ([[graft.operators.Layout.zkey2Sql]]), so they cannot drift. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val l = Tables.lineitem(spark, dir)
    val r = l.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val n = l
      .withColumn("na", Layout.byteRank("l_partkey", r.getLong(0), r.getLong(1)))
      .withColumn("nb", Layout.byteRank("l_suppkey", r.getLong(2), r.getLong(3)))
    Layout.zorderBuckets(n, "na", "nb", bits = 8, log2Buckets = 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("a_min"), max("l_partkey").as("a_max"),
        min("l_suppkey").as("b_min"), max("l_suppkey").as("b_max"))
      .orderBy("bucket")
  }

  def oracles: Map[String, String] = Map(
    // full KMV replay: 60-bit hash from md5 hex, per-corpus bottom-k over
    // distinct hashes (single-level — equivalent to the operator's salted
    // two-level, spec-gated), (k-1)*2^60 // kth estimates in HUGEINT,
    // merged-union re-rank with membership flags, exact twins via the
    // distinct-gram join
    "q9_kmv_overlap" ->
      """WITH nn AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tkk AS (SELECT doc_id,
        |    list_filter(string_split(norm, ' '), t -> len(t) > 0) AS tk
        |  FROM nn),
        |g AS (SELECT 'c' || (doc_id % 3) AS corpus,
        |    unnest(list_distinct(list_transform(range(1, len(tk) - 1),
        |      i -> array_to_string(tk[i:i+2], ' ')))) AS gram
        |  FROM tkk WHERE len(tk) >= 3),
        |dg AS (SELECT DISTINCT corpus, gram FROM g),
        |dh AS (SELECT DISTINCT corpus,
        |    ('0x' || substr(md5('kmv:' || gram), 1, 15))::BIGINT AS h
        |  FROM dg),
        |sk AS (SELECT corpus, h FROM (
        |    SELECT corpus, h,
        |      row_number() OVER (PARTITION BY corpus ORDER BY h) AS rk
        |    FROM dh) WHERE rk <= 256),
        |per AS (SELECT corpus, count(*)::BIGINT AS sk_n, max(h) AS kth
        |  FROM sk GROUP BY corpus),
        |perest AS (SELECT corpus,
        |    CASE WHEN sk_n < 256 THEN sk_n
        |         ELSE ((255::HUGEINT * (1::HUGEINT << 60)) // kth)::BIGINT
        |    END AS est
        |  FROM per),
        |pairs AS (SELECT a.corpus AS ca, b.corpus AS cb
        |  FROM (SELECT DISTINCT corpus FROM sk) a
        |  JOIN (SELECT DISTINCT corpus FROM sk) b ON a.corpus < b.corpus),
        |uv AS (SELECT p.ca, p.cb, s.h,
        |    max(CASE WHEN s.corpus = p.ca THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.corpus = p.cb THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs p JOIN sk s ON s.corpus = p.ca OR s.corpus = p.cb
        |  GROUP BY 1, 2, 3),
        |mu AS (SELECT * FROM (
        |    SELECT uv.*, row_number() OVER (PARTITION BY ca, cb ORDER BY h) AS rk
        |    FROM uv) WHERE rk <= 256),
        |uagg AS (SELECT ca, cb, count(*)::BIGINT AS kk, max(h) AS kth_u,
        |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)::BIGINT AS rho
        |  FROM mu GROUP BY 1, 2),
        |uest AS (SELECT ca, cb, kk, rho,
        |    CASE WHEN kk < 256 THEN kk
        |         ELSE ((255::HUGEINT * (1::HUGEINT << 60)) // kth_u)::BIGINT
        |    END AS union_est
        |  FROM uagg),
        |ex AS (SELECT corpus, count(*)::BIGINT AS n_exact FROM dg GROUP BY corpus),
        |xi AS (SELECT p.ca, p.cb, count(*)::BIGINT AS inter_exact
        |  FROM pairs p
        |  JOIN dg a ON a.corpus = p.ca
        |  JOIN dg b ON b.corpus = p.cb AND b.gram = a.gram
        |  GROUP BY 1, 2)
        |SELECT u.ca AS corpus_a, u.cb AS corpus_b, 256::BIGINT AS k,
        |  ea.est AS n_a_est, xa.n_exact AS n_a_exact,
        |  eb.est AS n_b_est, xb.n_exact AS n_b_exact,
        |  u.union_est,
        |  (xa.n_exact + xb.n_exact - coalesce(xi.inter_exact, 0)) AS union_exact,
        |  ((u.rho::HUGEINT * u.union_est) // u.kk)::BIGINT AS inter_est,
        |  coalesce(xi.inter_exact, 0) AS inter_exact,
        |  ((u.rho * 1000000) // u.kk)::BIGINT AS jaccard_est_ppm,
        |  ((coalesce(xi.inter_exact, 0)::HUGEINT * 1000000)
        |    // (xa.n_exact + xb.n_exact - coalesce(xi.inter_exact, 0)))::BIGINT
        |    AS jaccard_exact_ppm,
        |  ((abs(u.union_est - (xa.n_exact + xb.n_exact - coalesce(xi.inter_exact, 0)))::HUGEINT
        |      * 1000000)
        |    // (xa.n_exact + xb.n_exact - coalesce(xi.inter_exact, 0)))::BIGINT
        |    AS err_union_ppm
        |FROM uest u
        |JOIN perest ea ON ea.corpus = u.ca
        |JOIN perest eb ON eb.corpus = u.cb
        |JOIN ex xa ON xa.corpus = u.ca
        |JOIN ex xb ON xb.corpus = u.cb
        |LEFT JOIN xi ON xi.ca = u.ca AND xi.cb = u.cb
        |ORDER BY corpus_a, corpus_b""".stripMargin,
    // full HDR-sketch replay: bucket (e, m) via bin-string bitlength +
    // integer shifts, map-side count rollup, value-ordered cumulative,
    // nearest-rank read-out selected relationally (cum>=r AND cum-c<r)
    "q7_hdr_quantiles" ->
      """WITH src AS (SELECT l_returnflag AS k,
        |    floor(l_extendedprice * 100)::BIGINT AS v FROM lineitem),
        |b AS (SELECT k, v,
        |    greatest(0, length(bin(v)) - 7)::BIGINT AS e FROM src),
        |bm AS (SELECT k, e, (v >> e::INT)::BIGINT AS m FROM b),
        |c AS (SELECT k, e, m, count(*)::BIGINT AS c FROM bm GROUP BY 1, 2, 3),
        |t AS (SELECT *, sum(c) OVER (PARTITION BY k)::BIGINT AS n,
        |    sum(c) OVER (PARTITION BY k ORDER BY e, m)::BIGINT AS cum
        |  FROM c),
        |q AS (SELECT t.*, qq.q,
        |    ((qq.q * t.n + 99) // 100)::BIGINT AS r
        |  FROM t, (VALUES (50), (90), (99)) qq(q))
        |SELECT k AS l_returnflag, q::BIGINT AS q_pct, n,
        |  (m << e::INT)::BIGINT AS est,
        |  ((1::BIGINT << e::INT) - 1)::BIGINT AS max_err
        |FROM q WHERE cum >= r AND cum - c < r
        |ORDER BY l_returnflag, q_pct""".stripMargin,
    // full HLL replay: register maxes via bin-string bitlength, exact
    // T = sum 2^(53-Mj) as BIGINT, raw estimate as one HUGEINT floor
    // division with the exact rational alpha, LC branch via ln of an
    // integer ratio; the exact twin is a plain count(DISTINCT)
    "q6_hll" ->
      ("""WITH keys AS (
         |  SELECT 'l_orderkey' AS col_name, l_orderkey::VARCHAR AS k FROM lineitem
         |  UNION ALL SELECT 'l_partkey', l_partkey::VARCHAR FROM lineitem
         |  UNION ALL SELECT 'l_suppkey', l_suppkey::VARCHAR FROM lineitem),
         |h AS (SELECT col_name, md5('hll:' || col_name || ':' || k) AS hx, k FROM keys),
         |rw AS (SELECT col_name,
         |         ('0x' || substr(hx, 1, 2))::BIGINT AS reg,
         |         ('0x' || substr(hx, 3, 13))::BIGINT AS w
         |       FROM h),
         |regmax AS (SELECT col_name, reg,
         |             max(CASE WHEN w = 0 THEN 53 ELSE 53 - len(bin(w)) END)::BIGINT AS mj
         |           FROM rw GROUP BY 1, 2),
         |grid AS (SELECT col_name, unnest(range(0, 256)) AS reg
         |         FROM (SELECT DISTINCT col_name FROM keys)),
         |fr AS (SELECT g.col_name, coalesce(r.mj, 0) AS mj
         |       FROM grid g LEFT JOIN regmax r
         |         ON g.col_name = r.col_name AND g.reg = r.reg),
         |agg AS (SELECT col_name,
         |          sum(1::BIGINT << (53 - mj)::INT)::BIGINT AS t_sum,
         |          sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
         |        FROM fr GROUP BY col_name),
         |est AS (SELECT col_name, t_sum, v_zero,
         |          ((1846528::HUGEINT * 256 * 256 * (1::HUGEINT << 53))
         |            // (2570790::HUGEINT * t_sum))::BIGINT AS raw_est
         |        FROM agg),
         |fin AS (SELECT col_name, t_sum, v_zero, raw_est,
         |          CASE WHEN raw_est <= 640 AND v_zero > 0
         |               THEN floor(256 * ln(256.0 / v_zero))::BIGINT
         |               ELSE raw_est END AS est
         |        FROM est),
         |ex AS (SELECT col_name, count(DISTINCT k)::BIGINT AS exact
         |       FROM keys GROUP BY col_name)
         |SELECT f.col_name, f.v_zero, f.t_sum, f.raw_est, f.est, e.exact,
         |  CASE WHEN e.exact > 0 THEN (abs(f.est - e.exact) * 1000000) // e.exact
         |       ELSE 0 END AS err_ppm
         |FROM fin f JOIN ex e USING (col_name) ORDER BY f.col_name""").stripMargin,
    "q4_skew_report" ->
      """WITH e AS (SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS ukey
        |           FROM events),
        |c AS (SELECT ukey, count(*) AS cnt FROM e GROUP BY ukey),
        |n AS (SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
        |        max(cnt)::BIGINT AS max_count FROM c),
        |r AS (SELECT ukey, cnt,
        |        row_number() OVER (ORDER BY cnt ASC, ukey ASC) - 1 AS rn FROM c),
        |qs AS (SELECT
        |    min(CASE WHEN rn = (n.n_keys - 1) // 2 THEN cnt END)::BIGINT AS p50_count,
        |    min(CASE WHEN rn = ((n.n_keys - 1) * 99) // 100 THEN cnt END)::BIGINT AS p99_count
        |  FROM r, n),
        |top AS (SELECT ukey, cnt,
        |          row_number() OVER (ORDER BY cnt DESC, ukey ASC) AS top_rank
        |        FROM c ORDER BY cnt DESC, ukey ASC LIMIT 10)
        |SELECT t.top_rank::BIGINT AS top_rank, t.ukey, t.cnt::BIGINT AS cnt,
        |  n.n_keys, n.n_rows, n.max_count, qs.p50_count, qs.p99_count,
        |  ((n.max_count * n.n_keys + n.n_rows - 1) // n.n_rows)::BIGINT AS suggested_salt
        |FROM top t, n, qs ORDER BY t.top_rank""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join3" ->
      """SELECT c.c_mktsegment, n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus <> 'P'
        |GROUP BY c.c_mktsegment, n.n_name
        |ORDER BY c.c_mktsegment, n.n_name""".stripMargin,
    "z1_zorder_layout" ->
      s"""WITH r AS (SELECT min(l_partkey) amin, max(l_partkey) amax,
         |    min(l_suppkey) bmin, max(l_suppkey) bmax FROM lineitem),
         |n AS (SELECT l_partkey, l_suppkey,
         |    ((l_partkey - r.amin) * 255) // greatest(1, r.amax - r.amin) AS na,
         |    ((l_suppkey - r.bmin) * 255) // greatest(1, r.bmax - r.bmin) AS nb
         |  FROM lineitem, r),
         |z AS (SELECT l_partkey, l_suppkey,
         |    (${graft.operators.Layout.zkey2Sql("na", "nb", 8)}) AS zkey
         |  FROM n)
         |SELECT (zkey >> 12) AS bucket, count(*) AS n_rows,
         |  min(l_partkey) AS a_min, max(l_partkey) AS a_max,
         |  min(l_suppkey) AS b_min, max(l_suppkey) AS b_max
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "z2_hilbert_layout" ->
      s"""WITH r AS (SELECT min(l_partkey) amin, max(l_partkey) amax,
         |    min(l_suppkey) bmin, max(l_suppkey) bmax FROM lineitem),
         |n AS (SELECT l_partkey, l_suppkey,
         |    ((l_partkey - r.amin) * 255) // greatest(1, r.amax - r.amin) AS na,
         |    ((l_suppkey - r.bmin) * 255) // greatest(1, r.bmax - r.bmin) AS nb
         |  FROM lineitem, r),
         |${graft.operators.Layout.hilbertSqlCtes("n", "na", "nb", 8,
            Seq("l_partkey", "l_suppkey"))}
         |SELECT (hd >> 12) AS bucket, count(*) AS n_rows,
         |  min(l_partkey) AS a_min, max(l_partkey) AS a_max,
         |  min(l_suppkey) AS b_min, max(l_suppkey) AS b_max
         |FROM h0 GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q3_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag, l_linestatus)::BIGINT AS gid,
        |  count(*)::BIGINT AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin
  )

  /** TPC-H Q1-shaped pricing summary: single scan, map-side partial agg,
    * one shuffle on the (tiny-cardinality) group keys. Scales linearly —
    * the shuffle moves only |groups| x |partitions| pre-aggregated rows. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** 3-way join: only `nation` (a true 25-row dimension) is force-broadcast.
    * `customer` scales with the data, so its join is left to the planner —
    * AQE auto-broadcasts it at small SF and shuffle-joins at scale; a
    * hard-coded broadcast(customer) would OOM a 100 TB deployment. At
    * cluster scale the fact tables would be bucketed on orderkey to kill
    * the lineitem⋈orders shuffle too. */
  def q2Join3(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "P")
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_mktsegment", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment", "n_name")
  }
}

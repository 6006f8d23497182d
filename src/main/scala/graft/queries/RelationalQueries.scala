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
    "q2_join3" -> ((s, dir) => q2Join3(s, dir))
  )

  def oracles: Map[String, String] = Map(
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
        |ORDER BY c.c_mktsegment, n.n_name""".stripMargin
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

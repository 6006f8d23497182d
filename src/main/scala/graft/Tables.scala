package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst's predicate pushdown /
  * column pruning apply (the 100 TB design rule: every query starts from a
  * declarative scan, never a pre-collected dataset).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a (possibly single-row-group) scan out to all cores before a
    * compute-bound stage. The testdata files are one row group each, so
    * without this every md5/cosine/simhash loop runs on ONE task — at
    * cluster scale the input would already be many splits and this becomes a
    * cheap no-op-ish round robin. Call it only in front of per-row-heavy
    * work; pure scan→filter→agg paths stay un-shuffled. */
  def scaled(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** events.ts normalizes to a session-TZ µs timestamp whatever the
    * generator emitted — the driver has shipped BOTH layouts across rounds:
    * TIMESTAMP(NANOS) (Spark refuses natively; read as long ns via the
    * legacy flag, integer-div to µs — `div`, not `/`: epoch-ns ~1.7e18
    * exceeds double precision) and, since round 8, plain timestamp[us]
    * (arrives as TIMESTAMP_NTZ; cast is micros-identity under the UTC
    * session every entrypoint pins). Dispatch on the read schema so a
    * regenerated testdata layout can't break every e-query again. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

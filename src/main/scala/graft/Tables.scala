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
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark refuses natively;
    * read as long ns (legacy flag) and convert to a µs timestamp — the
    * generator emits µs-precision values, so this is lossless. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, not `/`: epoch-ns (~1.7e18) exceeds double precision.
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Index-table persistence (SURVEY S12 + §4 partition-pruning rows).
  *
  * At 100 TB the chunk index is written once and queried many times, so the
  * write is where co-location is bought:
  *  - `writePartitioned` — directory partitioning on a low-cardinality scope
  *    column (`app_id`, or `cluster_id` for IVF lists): Catalyst prunes
  *    whole directories for scoped queries.
  *  - `writeBucketed` — hash-bucketed (and sorted) by the join key
  *    (`document_id`): joins/aggregations between tables bucketed on the
  *    same key plan with ZERO exchanges (verified in IndexStoreSpec by
  *    asserting the absence of Exchange nodes).
  */
object IndexStore {

  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(path)

  /** Bucketed tables require the session catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}

package graft
import org.apache.spark.sql.SparkSession

/** Dev probe for connected-components timing. Data dir and parallelism come
  * from args/env (like [[Verify]]): `runMain graft.CcProbe [sfDir]` with
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_THREADS` as fallbacks. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val threads = sys.env.getOrElse("SPARK_GRAFT_THREADS", "32")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.queries.TextQueries.components(spark, dir).count()
    System.err.println(f"[probe] rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

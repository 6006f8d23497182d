package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registry queries (warm + median-of-3) without
  * paying for the whole Bench suite — the per-operator iteration loop.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchOne <query> [<query>...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      // noop sink, not count(): materialize every output column (same
      // rationale as Bench — count() lets Catalyst prune projection-final
      // operators down to their scan)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val w = once(); val samples = Seq(once(), once(), once()).sorted
      println(f"[benchone] $n warm $w%.2fs median ${samples(1)}%.2fs min ${samples.head}%.2fs")
    }
    spark.stop()
  }
}

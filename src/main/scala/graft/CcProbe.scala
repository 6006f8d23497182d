package graft
import org.apache.spark.sql.SparkSession
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.queries.TextQueries.components(spark, "/root/testdata/sf0.1").count()
    System.err.println(f"[probe] rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}

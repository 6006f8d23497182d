package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Listing

/** Keyset pagination == offset pagination, walked page by page: the
  * cursor walk must visit exactly the offset walk's rows in the same
  * order, including across sort-value ties (the tuple compare's job). */
class ListingKeysetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cursor walk visits the offset walk's rows, in order, across ties") {
    import spark.implicits._
    // many ties in the sort column so page boundaries land INSIDE tie runs
    val df = (0 until 203).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "sk")
    val pageSize = 20
    val offsetWalk = df.orderBy(col("sk"), col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    var cursor: Option[(Long, String)] = None
    val keysetWalk = Iterator.continually {
      val page = Listing.keysetPage(df, lit(true), "sk", "id",
        cursor.map { case (i, s) => (lit(s), lit(i)) }, pageSize)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      cursor = page.lastOption.map { case (i, s) => (i, s) }
      page
    }.takeWhile(_.nonEmpty).flatten.toSeq
    assert(keysetWalk == offsetWalk,
      s"keyset walk diverged at ${keysetWalk.zip(offsetWalk).indexWhere(p => p._1 != p._2)}")
    assert(keysetWalk.size == 203)
  }
}

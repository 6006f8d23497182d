package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Verify-time driver-compat guard (round 8's v18 lesson): the
  * driver's pandas-based oracle canonicalizer cannot sort array/map/
  * struct cells, so any registered query emitting a non-scalar top-level
  * column fails its gate with a harness error that LOOKS like a wrong
  * answer. [[Verify.assertDriverSafe]] turns that silent wall into a loud
  * repo-side failure; the registry walk below proves no currently
  * registered query trips it. */
class VerifySchemaGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scalar-only schemas pass") {
    Verify.assertDriverSafe("ok", StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BinaryType),
      StructField("t", TimestampType), StructField("f", BooleanType))))
  }

  test("wide decimals are rejected; int64-safe decimals pass (r14's " +
    "e24/e27/gr8 canonicalization wall)") {
    // precision <= 18 fits the driver's int64 fast path - allowed
    Verify.assertDriverSafe("ok_narrow", StructType(Seq(
      StructField("x", DecimalType(18, 0)), StructField("y", DecimalType(10, 2)))))
    for (dt <- Seq(DecimalType(38, 0), DecimalType(19, 0), DecimalType(38, 6))) {
      val e = intercept[IllegalStateException] {
        Verify.assertDriverSafe("wide_query", StructType(Seq(
          StructField("id", LongType), StructField("moment", dt))))
      }
      assert(e.getMessage.contains("wide_query") &&
        e.getMessage.contains("moment") &&
        e.getMessage.contains("int128"),
        s"error must name the query, column, and class: ${e.getMessage}")
    }
  }

  test("array, map, and struct top-level columns are rejected by name") {
    for (dt <- Seq(ArrayType(LongType), MapType(StringType, LongType),
                   StructType(Seq(StructField("x", LongType))))) {
      val e = intercept[IllegalStateException] {
        Verify.assertDriverSafe("bad_query", StructType(Seq(
          StructField("id", LongType), StructField("payload", dt))))
      }
      assert(e.getMessage.contains("bad_query") &&
        e.getMessage.contains("payload"),
        s"error must name the query and column: ${e.getMessage}")
    }
  }

  test("every registered query's output schema is driver-safe") {
    // schema inspection builds the plan without executing it; query
    // builders that do driver-side model fitting (IVF/PQ training) run
    // at sf0.001, so the walk stays cheap
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { Verify.assertDriverSafe(name, fn(spark, dir).schema); None }
        catch {
          case e: IllegalStateException => Some(s"$name: ${e.getMessage}")
          case e: Throwable => Some(s"$name: failed to build plan: $e")
        }
    }
    assert(bad.isEmpty, s"driver-unsafe registered outputs:\n${bad.mkString("\n")}")
  }
}

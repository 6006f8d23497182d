package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface spec: GraftExtensions injects the custom expressions into a
  * session's function registry, so `spark.sql(...)` can call them directly —
  * the deployment shape of `spark.sql.extensions=graft.GraftExtensions` on a
  * shared cluster. The spec builds a sibling session (same SparkContext) with
  * the extension and restores the shared default session afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val base: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withExtendedSession[A](f: SparkSession => A): A = {
    base // force the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("vector functions are callable from SQL") {
    withExtendedSession { s =>
      val row = s.sql(
        """SELECT
          |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,
          |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dp,
          |  hamming(binary_quantize(array(1.0F, -1.0F, 1.0F, -1.0F)),
          |          binary_quantize(array(1.0F, 1.0F, -1.0F, -1.0F))) AS hd,
          |  max_sim_float(array(array(1.0F, 0.0F), array(0.0F, 1.0F)),
          |                array(array(2.0F, 0.0F))) AS msf,
          |  max_sim_binary(array(binary_quantize(array(1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F))),
          |                 array(binary_quantize(array(1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F, 1.0F)))) AS msb
          |""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
      assert(row.getInt(2) == 2)
      assert(math.abs(row.getDouble(3) - 2.0) < 1e-12) // best dot = 2
      assert(math.abs(row.getDouble(4) - 1.0) < 1e-12) // identical -> sim 1
    }
  }

  test("text-hash functions are callable from SQL and match the Column API") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions.{col, lit}
      import graft.functions.text
      val df = s.createDataFrame(Seq(Tuple1("the quick brown fox jumps over the lazy dog")))
        .toDF("norm")
      df.createOrReplaceTempView("t")
      val viaSql = s.sql(
        "SELECT minhash_signature(norm, 4, 5) AS sig, simhash48(norm) AS sh FROM t").head()
      val viaCol = df.select(
        text.minhash_signature_fast(col("norm"), 4, 5).as("sig"),
        text.simhash48_fast(col("norm")).as("sh")).head()
      assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
      assert(viaSql.getLong(1) == viaCol.getLong(1))
      val _ = lit(1) // keep the import used
    }
  }

  test("literal-int params are enforced for hash sizing") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT minhash_signature('abc', cast(rand() * 4 AS INT), 5)").collect()
      }
      assert(e.getMessage.contains("integer literal") ||
        Option(e.getCause).exists(_.getMessage.contains("integer literal")))
    }
  }

  test("extension class is loadable by configuration name") {
    // spark.sql.extensions instantiates by reflection: verify the contract.
    val cls = Class.forName("graft.GraftExtensions")
    val inst = cls.getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    inst(new org.apache.spark.sql.SparkSessionExtensions) // applies cleanly
  }

  test("round-8 kernel functions are callable from SQL and match the Column API") {
    withExtendedSession { s =>
      val row = s.sql(
        """SELECT
          |  hilbert_index(3L, 5L, 8) AS h,
          |  winnow_fingerprints('abcdefghij klmno', 5, 16) AS w,
          |  jl_project(array(0.5F, -0.25F, 1.0F), 4, 3) AS p
          |""".stripMargin).head()
      assert(row.getLong(0) ==
        graft.functions.LayoutExpressions.hilbertXy2d(3L, 5L, 8))
      assert(row.getSeq[Long](1).nonEmpty)
      assert(row.getSeq[Long](1) ==
        graft.functions.WinnowExpressions.winnowPacked(
          org.apache.spark.unsafe.types.UTF8String.fromString("abcdefghij klmno"),
          5, 16).toSeq)
      assert(row.getSeq[Long](2) ==
        graft.functions.VectorExpressions.jlProjectKernel(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            Array(0.5f, -0.25f, 1.0f)), 4, 3, "jl").toLongArray().toSeq)
    }
  }
}

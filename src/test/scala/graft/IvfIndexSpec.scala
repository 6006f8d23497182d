package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, KnnSearch}
import graft.queries.VectorQueries

/** IVF invariants: probing every list is exhaustive (== brute force), and
  * partial probing returns a correctly-ordered subset of the corpus. */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("nprobe == lists is exact (matches brute force)") {
    val e = Tables.embeddings(spark, dir)
    val q = VectorQueries.queryVec(spark, dir)
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 8)
    val ivf = IvfIndex.query(indexed, model, "embedding", "vec_id", q, 10, nprobe = 8,
      where = col("vec_id") =!= 0)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bf = KnnSearch.topK(e, "embedding", "vec_id", q, 10, col("vec_id") =!= 0)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == bf)
  }

  test("partial probe returns k valid candidates with scores <= exact best") {
    val e = Tables.embeddings(spark, dir)
    val q = VectorQueries.queryVec(spark, dir)
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 8)
    val ivf = IvfIndex.query(indexed, model, "embedding", "vec_id", q, 10, nprobe = 2,
      where = col("vec_id") =!= 0).select("score").collect().map(_.getDouble(0))
    assert(ivf.length == 10)
    val bfBest = KnnSearch.topK(e, "embedding", "vec_id", q, 1, col("vec_id") =!= 0)
      .select("score").head().getDouble(0)
    assert(ivf.forall(_ <= bfBest + 1e-12))
    assert(ivf.sorted.reverse.toSeq == ivf.toSeq) // descending order
  }

  test("cluster-partitioned store: probe-pruned read scans only probed lists") {
    val e = Tables.embeddings(spark, dir)
    val q = VectorQueries.queryVec(spark, dir)
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    graft.sources.IndexStore.writePartitioned(indexed, path, "cluster_id")
    val stored = spark.read.parquet(path)
    val probed = model.nearestClusters(q, 2)
    val pruned = stored.filter(col("cluster_id").isin(probed: _*))
    // directory pruning: only the 2 probed cluster dirs are actually read
    // (input_file_name() reflects the post-pruning scan, unlike inputFiles)
    val dirsRead = pruned.select(input_file_name())
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
      .map(_.split("/").init.last).distinct.sorted
    assert(dirsRead.toSeq == probed.map(c => s"cluster_id=$c").sorted)
    // and the stored+pruned query equals the in-memory probe-pruned query
    val fromStore = graft.operators.KnnSearch
      .topK(pruned, "embedding", "vec_id", q, 10, col("vec_id") =!= 0)
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    val inMem = IvfIndex.query(indexed, model, "embedding", "vec_id", q, 10, nprobe = 2,
      where = col("vec_id") =!= 0)
      .select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    assert(fromStore == inMem)
  }

  test("half-probe recall@10 on the seeded corpus (the v7 bench configuration)") {
    // v7 runs lists=16 / nprobe=8 at sf scale; everything is seeded, so the
    // measured recall is a deterministic property of the index, pinning it
    // guards against silent quantizer/probe regressions (v7 is the one
    // registry query the DuckDB oracle cannot replay).
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = VectorQueries.queryVec(spark, "/root/testdata/sf0.01")
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 16)
    val ivf = IvfIndex.query(indexed, model, "embedding", "vec_id", q, 10, nprobe = 8,
      where = col("vec_id") =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = KnnSearch.topK(e, "embedding", "vec_id", q, 10, col("vec_id") =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = ivf.intersect(exact).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("mean recall@10 over 20 seeded queries clears the floor (ScaleProbe's metric)") {
    // The same measurement ScaleProbe `recall` reports at x1/x4/x16, run at
    // sf0.01 as a regression gate: mean over the 20 fixed query vectors,
    // lists=16 / nprobe=8 (the v7 bench configuration). One query may land
    // near a cluster boundary (min can dip), but the MEAN is a stable
    // property of the seeded index — a quantizer or probe-selection
    // regression drags it down immediately.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 16)
    indexed.cache().count()
    val queries = e.filter(col("vec_id") < 20).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(queries.length == 20)
    val recalls = queries.map { case (qid, qv) =>
      val exact = KnnSearch.topK(e, "embedding", "vec_id", qv, 10,
        col("vec_id") =!= qid)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = IvfIndex.query(indexed, model, "embedding", "vec_id", qv,
        10, nprobe = 8, where = col("vec_id") =!= qid)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    indexed.unpersist(); e.unpersist()
    assert(mean >= 0.75, s"mean recall@10 = $mean (per-query: ${recalls.mkString(",")})")
  }

  test("k-proportional-to-n operating point clears the floor on a grown corpus") {
    // The ScaleProbe kpropn column's CI regression gate: replicate the
    // sf0.01 corpus 4x with the probe's jitter methodology (seeded hash,
    // ±0.025/component on replicas 1+), grow lists with the corpus
    // (16 -> 64, constant expected occupancy) and keep the half-probe
    // fraction (nprobe=32). Measured x4 at sf0.1 scale: mean 0.915; this
    // seeded CI corpus measures its own deterministic value — the floor
    // guards the quantizer/probe path, not the exact number.
    val base = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val maxVec = base.agg(max("vec_id")).head().getLong(0) + 1
    val e = (0 until 4).map { i =>
      val shifted = base.withColumn("vec_id", col("vec_id") + lit(i * maxVec))
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(hash(col("vec_id"), lit(i), j), lit(1000)).cast("double")
            / 1000.0 - 0.5) * 0.05).cast("float")))
    }.reduce(_ unionByName _).cache()
    val (indexed, model) = IvfIndex.build(e, "embedding", lists = 64)
    indexed.cache().count()
    val queries = e.filter(col("vec_id") < 20).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (qid, qv) =>
      val exact = KnnSearch.topK(e, "embedding", "vec_id", qv, 10,
        col("vec_id") =!= qid)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = IvfIndex.query(indexed, model, "embedding", "vec_id", qv,
        10, nprobe = 32, where = col("vec_id") =!= qid)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    indexed.unpersist(); e.unpersist()
    assert(mean >= 0.75,
      s"kpropn mean recall@10 = $mean (per-query: ${recalls.mkString(",")})")
  }

  test("seeded zero-Lloyd build: full probe is exact; assignment is the " +
    "brute-force argmin with ties to the lower index") {
    val e = Tables.embeddings(spark, dir)
    val q = VectorQueries.queryVec(spark, dir)
    val (indexed, model) = IvfIndex.buildSeeded(e, "embedding", "vec_id", 8)
    // centroids are literally the 8 lowest-id embeddings
    val seeds = e.orderBy("vec_id").limit(8).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    assert(model.centroids.map(_.toSeq).toSeq == seeds.toSeq)
    // full probe == brute force (the v8 bridge holds for the seeded build)
    val probedAll = IvfIndex.probeSeeded(model, q, 8)
    val ivf = KnnSearch.topK(
        indexed.filter(col("cluster_id").isin(probedAll: _*)),
        "embedding", "vec_id", q, 10, col("vec_id") =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val bf = KnnSearch.topK(e, "embedding", "vec_id", q, 10, col("vec_id") =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivf == bf)
    // assignment replays as an independent driver-side argmin
    val got = indexed.select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (id, v) =>
      val want = model.centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length) { val t = v(j).toDouble - c(j); d += t * t; j += 1 }
        (d, i)
      }.minBy { case (d, i) => (d, i) }._2.toLong
      assert(got(id) == want, s"vec $id assigned ${got(id)} want $want")
    }
    // probe order is deterministic and prefix-monotone in nprobe
    assert(IvfIndex.probeSeeded(model, q, 3) ==
      IvfIndex.probeSeeded(model, q, 8).take(3))
  }
}

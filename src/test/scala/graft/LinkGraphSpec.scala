package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LinkGraph

/** Semantic properties of the fixed-point PageRank: the gr1 oracle proves
  * engine-equivalence on the synthesized host graph; this proves the
  * operator computes PageRank (mass conservation, dangling redistribution,
  * symmetry, a hub outranking leaves) and that the fixed-point design
  * delivers its headline property — bit-identical ranks under different
  * partitionings — via an exact in-test replay of the integer recurrence.
  */
class LinkGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Scale = 1000000000000L

  /** Naive single-threaded replay of the exact integer recurrence. */
  private def reference(edges: Seq[(String, String)], iters: Int,
                        dampPct: Long = 85L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val base = ((100L - dampPct) * Scale / 100L) / n
    var rank = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filter(v => !out.contains(v)).map(rank).sum
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / out(s) }.sum
      }
      rank = nodes.map(v => v ->
        (base + dampPct * (contrib.getOrElse(v, 0L) + dang / n) / 100L)).toMap
    }
    rank
  }

  // a → b, a → c, b → c, c → a, plus dangling d (only a target: c → d)
  private val g = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "c" -> "d")

  private def run(edges: Seq[(String, String)], iters: Int,
                  parts: Int = 4): Map[String, Long] =
    LinkGraph.pageRank(edges.toDF("s", "d").repartition(parts), "s", "d", iters)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap

  test("matches the exact integer recurrence on a graph with a dangling node") {
    for (iters <- Seq(1, 3, 7)) {
      assert(run(g, iters) == reference(g, iters), s"iters=$iters")
    }
  }

  test("rank mass is conserved up to integer-truncation loss") {
    val ranks = run(g, 5)
    val mass = ranks.values.sum
    val n = ranks.size
    // each node loses <1 unit per division; ≤3 divisions per node-iteration
    assert(mass <= Scale && mass >= Scale - 5L * 3L * (n + 1L), s"mass=$mass")
  }

  test("bit-identical ranks under different input partitionings") {
    val a = run(g ++ Seq("d" -> "a", "b" -> "a"), 6, parts = 1)
    val b = run(g ++ Seq("d" -> "a", "b" -> "a"), 6, parts = 7)
    assert(a == b)
  }

  test("structurally symmetric nodes get identical ranks; hub outranks leaves") {
    // star: l1..l4 → hub; hub → l1 (so hub isn't dangling)
    val star = (1 to 4).map(i => s"l$i" -> "hub") :+ ("hub" -> "l1")
    val ranks = run(star, 8)
    assert(ranks("l2") == ranks("l3") && ranks("l3") == ranks("l4"))
    assert(ranks("hub") > ranks("l2"))
    assert(ranks("l1") > ranks("l2")) // l1 receives the hub's outflow
  }

  test("pageRank rule-17 driver fast path == distributed loop == reference, " +
    "parallel edges counting multiply") {
    val mg = g ++ Seq("a" -> "b", "a" -> "b") // a->b carries weight 3
    val driver = run(mg, 5) // |edges| far under the default cap
    val dist = LinkGraph.pageRank(mg.toDF("s", "d"), "s", "d", 5,
        driverEdgeCap = 0) // cap 0 forces the distributed loop
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(driver == dist, "driver fit diverged from the distributed loop")
    assert(driver == reference(mg, 5))
  }

  test("mixed-width edge columns widen: int src + long dst runs both arms " +
    "and matches the all-long graph") {
    val mixed = Seq((1, 2L), (2, 3L), (3, 1L), (1, 3L)).toDF("s", "d")
    val asLong = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    def ranks(df: org.apache.spark.sql.DataFrame, cap: Int) =
      LinkGraph.pageRank(df, "s", "d", 4, driverEdgeCap = cap)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val driverMixed = ranks(mixed, 100000) // driver arm: would fail to
    // encode pre-widening (int src schema vs long dst values)
    assert(driverMixed == ranks(asLong, 100000))
    assert(driverMixed == ranks(mixed, 0), "distributed arm agrees")
    // incompatible node types fail loudly, not at encode time
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq((1, "x")).toDF("s", "d"), "s", "d", 2)
    }
  }

  test("rejects empty graphs and bad parameters") {
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(Seq.empty[(String, String)].toDF("s", "d"), "s", "d", 3)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(g.toDF("s", "d"), "s", "d", 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(g.toDF("s", "d"), "s", "d", 3, dampingPct = 101)
    }
  }

  /** Naive single-threaded replay of the exact HITS integer recurrence
    * (L1-normalized fixed point, BigInt for the ·scale renorm multiply —
    * the same widening the engine gets from decimal(38,0)). */
  private def hitsReference(edges: Seq[(String, String)],
                            iters: Int): Map[String, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> Scale / nodes.size).toMap
    var auth = Map.empty[String, Long].withDefaultValue(0L)
    for (_ <- 1 to iters) {
      val araw = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => hub(s) }.sum }
      val at = araw.values.sum
      auth = nodes.map(v => v -> araw.get(v)
        .map(r => (BigInt(r) * Scale / at).toLong).getOrElse(0L)).toMap
      val hraw = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map { case (_, d) => auth(d) }.sum }
      val ht = hraw.values.sum
      hub = nodes.map(v => v -> hraw.get(v)
        .map(r => (BigInt(r) * Scale / ht).toLong).getOrElse(0L)).toMap
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  // two directories pointing at shared sources, one off-topic page:
  // h1 -> {a1,a2,a3}, h2 -> {a1,a2}, a1 -> x
  private val hg = Seq("h1" -> "a1", "h1" -> "a2", "h1" -> "a3",
    "h2" -> "a1", "h2" -> "a2", "a1" -> "x")

  private def runHits(edges: Seq[(String, String)], iters: Int,
                      parts: Int = 4): Map[String, (Long, Long)] =
    LinkGraph.hits(edges.toDF("s", "d").repartition(parts), "s", "d", iters)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("hits matches the exact integer recurrence") {
    for (iters <- Seq(1, 3, 5)) {
      assert(runHits(hg, iters) == hitsReference(hg, iters), s"iters=$iters")
    }
  }

  test("hits separates hubs from authorities; the split PageRank can't make") {
    val r = runHits(hg, 5)
    // a1 and a2 share identical in-link structure — symmetric authorities
    // to the bit (a1's extra OUT-link must not leak into its auth score);
    // a3 (one directory) ranks below; the bigger directory h1 is the top
    // hub; pure hubs have zero authority and pure sinks zero hub score
    assert(r("a1")._1 == r("a2")._1 && r("a2")._1 > r("a3")._1)
    assert(r("a3")._1 > 0L)
    assert(r("h1")._2 > r("h2")._2)
    assert(r("h1")._1 == 0L && r("h2")._1 == 0L, "nothing links to the hubs")
    assert(r("a2")._2 == 0L && r("x")._2 == 0L, "sinks curate nothing")
  }

  test("hits is bit-identical under different input partitionings") {
    assert(runHits(hg, 5, parts = 1) == runHits(hg, 5, parts = 7))
  }

  test("hits rule-17 driver fast path == distributed loop == reference, " +
    "parallel edges counting multiply") {
    // parallel h2->a1 edges: the driver path carries them as weight 2, the
    // distributed path joins the raw duplicated rows — must agree to the bit
    val mg = hg ++ Seq("h2" -> "a1", "h2" -> "a1")
    val driver = runHits(mg, 5) // |edges| far under the default cap
    val dist = LinkGraph.hits(mg.toDF("s", "d"), "s", "d", 5,
        driverEdgeCap = 0) // cap 0 forces the distributed loop
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(driver == dist, "driver fit diverged from the distributed loop")
    assert(driver == hitsReference(mg, 5))
  }

  test("labelPropagation: hand-traced sync rounds on a triangle+pendant; " +
    "the pinned 2-cycle oscillation on an isolated pair; driver == " +
    "distributed; non-string nodes rejected") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("e", "f")).toDF("s", "t")
    def run(iters: Int, cap: Int = 100000): Map[String, (String, Long)] =
      LinkGraph.labelPropagation(edges, "s", "t", iters, cap)
        .as[(String, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1: a->b (min of {b,c}), b->a, c->a (min of {b?..}: nbrs
    // a,b,d labels a,b,d -> all count 1 -> a), d->c, e->f, f->e
    // round 2: triangle+pendant all collapse to 'a'; the isolated pair
    // SWAPS back — the known LPA bipartite 2-cycle, pinned by the fixed
    // iteration count (odd iters -> swapped, even -> identity)
    val two = run(2)
    assert(Seq("a", "b", "c", "d").forall(two(_) == (("a", 4L))))
    assert(two("e") == (("e", 1L)) && two("f") == (("f", 1L)))
    val five = run(5)
    assert(Seq("a", "b", "c", "d").forall(five(_) == (("a", 4L))))
    assert(five("e") == (("f", 1L)) && five("f") == (("e", 1L)),
      "odd rounds leave the pair mid-swap - determinism, pinned")
    assert(run(5) == run(5, cap = 0),
      "driver replay == distributed loop")
    val bad = Seq((1L, 2L)).toDF("s", "t")
    val thrown = intercept[IllegalArgumentException] {
      LinkGraph.labelPropagation(bad, "s", "t", 2)
    }
    assert(thrown.getMessage.contains("STRING node columns"))
  }

  test("kcore: path peels layer by layer, triangle survives as the 2-core; " +
    "dirty input normalizes; the round guard is loud") {
    // path 1-2-3-4 (ends peel round 1, middle round 2) + triangle 10-11-12
    // (the unique 2-core, degree 2 within); dirty input: duplicate +
    // reversed edges and a self-loop (node 5) that must vanish entirely
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 11L), (11L, 10L), (11L, 12L), (12L, 10L),
      (5L, 5L)
    ).toDF("src", "dst")
    val out = graft.operators.LinkGraph.kcore(edges, "src", "dst", k = 2)
      .as[(Long, Option[Long], Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L),
      "self-loop-only node 5 has no simple edges and is not a graph node")
    assert(out(1L) == ((Some(1L), false, None)), "path end peels round 1")
    assert(out(4L) == ((Some(1L), false, None)))
    assert(out(2L) == ((Some(2L), false, None)), "exposed middle peels round 2")
    assert(out(3L) == ((Some(2L), false, None)))
    Seq(10L, 11L, 12L).foreach { n =>
      assert(out(n) == ((None, true, Some(2L))),
        s"triangle member $n: in-core at degree 2")
    }
    // the runaway guard raises instead of looping
    val err = intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.kcore(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"),
        "src", "dst", k = 2, maxRounds = 1).collect()
    }
    assert(err.getMessage.contains("did not converge"))
  }

  // two shared-edge triangles (abc, bcd) + pendant e off d — every
  // count/coefficient below is hand arithmetic on this 5-node graph:
  // deg a=2 b=3 c=3 d=3 e=1; tri a=1 b=2 c=2 d=1 e=0
  private val triG = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"))

  test("triangles: hand-counted corners and exact-ppm clustering; dirty " +
    "input normalizes; partitioning-invariant") {
    val dirty = (triG ++ Seq(("b", "a"), ("a", "b"), ("e", "e"))).toDF("s", "t")
    val out = graft.operators.LinkGraph.triangles(dirty, "s", "t")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "a" -> ((2L, 1L, Some(1000000L))), // 2·1e6/(2·1)
      "b" -> ((3L, 2L, Some(666666L))),  // 4e6/6 floored
      "c" -> ((3L, 2L, Some(666666L))),
      "d" -> ((3L, 1L, Some(333333L))),  // 2e6/6 floored
      "e" -> ((1L, 0L, None))))          // undefined below degree 2
    val p7 = graft.operators.LinkGraph
      .triangles(triG.toDF("s", "t").repartition(7), "s", "t")
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(p7.map(r => r._1 -> ((r._2, r._3, r._4))).toMap == out,
      "bit-identical on a different partitioning")
    // a star has wedges but zero triangles
    val star = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("s", "t")
    val starOut = graft.operators.LinkGraph.triangles(star, "s", "t")
      .as[(String, Long, Long, Option[Long])].collect()
    assert(starOut.forall(_._3 == 0L))
    assert(starOut.find(_._1 == "h").get._4.contains(0L),
      "hub coefficient is defined and exactly 0")
  }

  test("linkPredict: hand-scored distance-2 pairs in RA order; the topK " +
    "cut respects the total order; the hub cap is loud via the audit") {
    val edges = triG.toDF("s", "t")
    val out = graft.operators.LinkGraph
      .linkPredict(edges, "s", "t", topK = 10)
      .as[(String, String, Long, Long, Long)].collect()
    // (a,d): CN {b,c}, ra 333333+333333, jacc 2e6/(2+3-2)
    // (b,e)/(c,e): CN {d}, ra 333333, jacc 1e6/(3+1-1); tie broken by v
    assert(out.toSeq == Seq(
      ("a", "d", 2L, 666666L, 666666L),
      ("b", "e", 1L, 333333L, 333333L),
      ("c", "e", 1L, 333333L, 333333L)))
    val top2 = graft.operators.LinkGraph
      .linkPredict(edges, "s", "t", topK = 2)
      .as[(String, String, Long, Long, Long)].collect()
    assert(top2.toSeq == out.toSeq.take(2), "the cut follows the total order")
    // cap at degree 2: b/c/d (degree 3) stop being wedge centers — the
    // only surviving center a has adjacent neighbors, so no candidates
    val capped = graft.operators.LinkGraph
      .linkPredict(edges, "s", "t", topK = 10, maxCenterDegree = 2)
    assert(capped.count() == 0L)
    val dropped = graft.operators.LinkGraph
      .linkPredictDroppedHubs(edges, "s", "t", maxCenterDegree = 2)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(dropped.toSeq == Seq(("b", 3L), ("c", 3L), ("d", 3L)),
      "the audit names every excluded hub with its degree")
    // the gr7 registry configuration keeps every fixture node under the
    // cap — scores there are exact over the full wedge set
    assert(graft.operators.LinkGraph
      .linkPredictDroppedHubs(edges, "s", "t", maxCenterDegree = 4096)
      .count() == 0L)
  }

  test("seedDistance: shortcut wins the min-hop race; detached component " +
    "reads NULL; absent seeds contribute nothing; runaway guard is loud") {
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "b"),
      ("x", "y")).toDF("f", "t")
    val seeds = Seq("s", "q").toDF("seed") // q is not a graph node
    val out = graft.operators.LinkGraph
      .seedDistance(edges, "f", "t", seeds, "seed")
      .as[(String, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "s" -> ((Some(0L), true)), "a" -> ((Some(1L), true)),
      "b" -> ((Some(1L), true)), // via the shortcut, not the 2-hop path
      "c" -> ((Some(2L), true)),
      "x" -> ((None, false)), "y" -> ((None, false))))
    val err = intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.seedDistance(edges, "f", "t",
        Seq("s").toDF("seed"), "seed", maxRounds = 1)
    }
    assert(err.getMessage.contains("did not settle"))
  }

  test("reciprocity: mutual pairs count twice; a pure DAG reads 0; " +
    "duplicates collapse; the empty graph raises") {
    // a<->b mutual, b->c one-way, duplicate + self-loop noise
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("b", "c"),
      ("c", "c")).toDF("s", "t")
    val out = graft.operators.LinkGraph.reciprocity(edges, "s", "t")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((3L, 2L, 666666L)),
      "3 simple edges, the mutual pair contributes 2: 2e6/3 floored")
    val dag = graft.operators.LinkGraph.reciprocity(
      Seq(("a", "b"), ("b", "c")).toDF("s", "t"), "s", "t")
      .as[(Long, Long, Long)].collect().head
    assert(dag == ((2L, 0L, 0L)))
    val err = intercept[Exception] {
      graft.operators.LinkGraph.reciprocity(
        Seq(("a", "a")).toDF("s", "t"), "s", "t").collect()
    }
    assert(err.getMessage.contains("empty graph"))
  }

  test("personalizedPageRank: hand-replayed two-node teleport cycle; " +
    "mass localizes at the seeds; unreachable components read exactly 0; " +
    "isolated seed keeps teleporting; driver == distributed; guards loud") {
    def run(edges: Seq[(String, String)], seeds: Seq[String], iters: Int,
            cap: Int = 100000) =
      graft.operators.LinkGraph.personalizedPageRank(
        edges.toDF("s", "d"), "s", "d", seeds.toDF("seed"), "seed",
        iters, dampingPct = 50, scale = 1000000L, driverEdgeCap = cap)
        .as[(String, Long, Boolean, Long)]
        .collect().map(r => r._1 -> r).toMap
    // a<->b, seed {a}, d=.5, scale=1e6: r0=(1e6,0);
    // iter1: a = 5e5 + 0 = 5e5, b = 0 + 5e5 = 5e5
    // iter2: a = 5e5 + 2.5e5 = 7.5e5, b = 2.5e5
    val two = run(Seq("a" -> "b", "b" -> "a"), Seq("a"), 2)
    assert(two("a") == (("a", 1L, true, 750000L)))
    assert(two("b") == (("b", 1L, false, 250000L)))
    // detached component: c<->d never receives seed mass — exactly 0
    val det = run(Seq("a" -> "b", "b" -> "a", "c" -> "d", "d" -> "c"),
      Seq("a"), 5)
    assert(det("c")._4 == 0L && det("d")._4 == 0L,
      "unreachable mass is exactly zero, the localization property")
    // isolated seed z (absent from the edge set): joins as a dangling
    // node; its mass teleports back to the 2-seed set each round
    val iso = run(Seq("a" -> "b", "b" -> "a"), Seq("a", "z"), 3)
    assert(iso.contains("z") && iso("z")._2 == 0L && iso("z")._3)
    assert(iso("z")._4 > 0L, "isolated seed keeps teleport mass")
    // driver replay == distributed loop, bit for bit
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "d" -> "a")
    assert(run(edges, Seq("a", "d"), 4) == run(edges, Seq("a", "d"), 4,
      cap = 0), "driver fit diverged from the distributed loop")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.personalizedPageRank(
        Seq(("a", "b")).toDF("s", "d"), "s", "d",
        Seq.empty[String].toDF("seed"), "seed", 2)
    }
    assert(e1.getMessage.contains("empty seed set"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.personalizedPageRank(
        Seq(("a", "b")).toDF("s", "d"), "s", "d",
        Seq("a", "b").toDF("seed"), "seed", 2, seedCap = 1)
    }
    assert(e2.getMessage.contains("request-sized"))
  }

  test("assortativity: star is exactly -1; regular graph reads NULL; " +
    "triangle+pendant matches the hand moment arithmetic") {
    def run(edges: Seq[(String, String)]) =
      graft.operators.LinkGraph
        .assortativity(edges.toDF("s", "t"), "s", "t")
        .as[(Long, Long, Long, Long, Option[Long])]
        .collect().head
    val star = run(Seq(("h", "a"), ("h", "b"), ("h", "c")))
    assert(star._1 == 4L && star._2 == 3L &&
      star._5.contains(-1000000L), "perfect hub->leaf mixing")
    val cycle = run(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
    assert(cycle._5.isEmpty, "degree-regular: variance 0, r undefined")
    // triangle abc + pendant d on b: M=8, Σx=18, Σxx=44, Σxy=38 →
    // cov = −20, var = 28, r = −5/7 → floor(−714285.71…) = −714286
    val tp = run(Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")))
    assert(tp._3 == -20L && tp._4 == 28L,
      "numerators emit as int64 (the loudInt64 output contract)")
    assert(tp._5.contains(
      math.floor(-20.0 / (math.sqrt(28.0) * math.sqrt(28.0)) * 1e6).toLong),
      "the stated IEEE chain, replayed independently")
    assert(tp._5.contains(-714286L))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Evals

/** Hand-computed ranking metrics: the TREC definitions at k=5 over a
  * planted fixture covering a top-ranked hit, a gap, and a no-hit query. */
class EvalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("rankingMetrics: recall/MRR/NDCG match hand computation; no-hit query zeroes") {
    val ranked = Seq(
      (1L, 1L, 10L), (1L, 2L, 99L), (1L, 3L, 11L), (1L, 4L, 98L), (1L, 5L, 97L),
      (2L, 1L, 7L), (2L, 2L, 8L)
    ).toDF("query_id", "rank", "id")
    val relevant = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 50L))
      .toDF("query_id", "id")
    val out = Evals.rankingMetrics(ranked, relevant, k = 5)
      .select("query_id", "n_rel", "hits", "recall_at_k", "mrr", "ndcg_at_k")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, h1, rec1, mrr1, ndcg1) = out(1L)
    assert(n1 == 3L && h1 == 2L)
    assert(math.abs(rec1 - 2.0 / 3) < 1e-12)
    assert(mrr1 == 1.0, "first relevant at rank 1")
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(ndcg1 - dcg / idcg) < 1e-9, s"ndcg $ndcg1 vs ${dcg / idcg}")
    val (_, n2, h2, rec2, mrr2, ndcg2) = out(2L)
    assert(n2 == 1L && h2 == 0L && rec2 == 0.0 && mrr2 == 0.0 && ndcg2 == 0.0)
  }

  test("query with relevant docs but NO ranked rows scores zero, not omitted") {
    // the regression the eval layer exists to surface: the retriever
    // returned nothing for query 3 — it must drag the aggregate down
    val ranked = Seq((1L, 1L, 10L)).toDF("query_id", "rank", "id")
    val relevant = Seq((1L, 10L), (3L, 30L), (3L, 31L)).toDF("query_id", "id")
    val out = Evals.rankingMetrics(ranked, relevant, k = 5)
      .select("query_id", "n_rel", "hits", "recall_at_k", "mrr", "ndcg_at_k")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.contains(3L), "no-result query must not vanish from the eval")
    val (_, n3, h3, rec3, mrr3, ndcg3) = out(3L)
    assert(n3 == 2L && h3 == 0L && rec3 == 0.0 && mrr3 == 0.0 && ndcg3 == 0.0)
    // query with ranked rows is unaffected by the outer-join anchor
    assert(out(1L)._3 == 1L && out(1L)._5 == 1.0)
    // a query with NO relevant docs is still omitted (metrics undefined)
    assert(!out.contains(2L))
  }

  private def gen(cand: Seq[String], ref: Seq[String]) = {
    val df = Seq((1L, cand, ref)).toDF("id", "cand", "ref")
    Evals.genMetrics(df, "id", "cand", "ref")
      .select("r_len", "c_len", "m1", "m2", "m3", "m4",
        "log_bleu_ppm", "rouge1_f_ppm", "rouge2_f_ppm",
        "rouge1_p_ppm", "rouge1_r_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
  }

  test("genMetrics: Papineni clipping example — the degenerate candidate") {
    // the canonical BLEU §2.1 case: 'the'×7 vs 'the cat is on the mat'.
    // unigram precision clips at ref count 2; every higher order is 0.
    val out = gen(Seq.fill(7)("the"), "the cat is on the mat".split(" ").toSeq)
    val (rl, cl, m1, m2, m3, m4, bleu, r1f, r2f, r1p, r1r) = out
    assert(rl == 6L && cl == 7L)
    assert(m1 == 2L && m2 == 0L && m3 == 0L && m4 == 0L)
    // BP = min(0, 1-6/7) = 0; ln p = ln(3/8)+ln(1/7)+ln(1/6)+ln(1/5)
    val lb = 0.25 * (((math.log(3.0 / 8) + math.log(1.0 / 7)) +
      math.log(1.0 / 6)) + math.log(1.0 / 5))
    assert(bleu == math.floor(1e6 * lb).toLong, s"$bleu vs $lb")
    assert(r1f == 2L * 2 * 1000000 / 13)      // 2m/(c+r) = 4/13
    assert(r2f == 0L)
    assert(r1p == 2L * 1000000 / 7 && r1r == 2L * 1000000 / 6)
  }

  test("genMetrics: identical pair scores log-BLEU 0 and ROUGE-1 F1 = 1e6") {
    val toks = "a b c d e".split(" ").toSeq
    val (rl, cl, m1, m2, m3, m4, bleu, r1f, r2f, _, _) = gen(toks, toks)
    assert(rl == 5L && cl == 5L)
    assert(m1 == 5L && m2 == 4L && m3 == 3L && m4 == 2L)
    assert(bleu == 0L, "perfect match: BP=0 and every smoothed p_n = 1")
    assert(r1f == 1000000L && r2f == 1000000L)
  }

  test("genMetrics: brevity penalty fires on a short candidate; n>len orders are neutral") {
    // candidate of 2 tokens: no 3/4-grams exist — (0+1)/(0+1) keeps those
    // ln terms at 0 instead of poisoning the sum
    val (rl, cl, m1, m2, _, _, bleu, _, r2f, _, _) =
      gen(Seq("a", "b"), Seq("a", "b", "c", "d"))
    assert(rl == 4L && cl == 2L && m1 == 2L && m2 == 1L)
    val lb = (1.0 - 4.0 / 2.0) +
      0.25 * (((math.log(3.0 / 3) + math.log(2.0 / 2)) + 0.0) + 0.0)
    assert(bleu == math.floor(1e6 * lb).toLong)
    assert(r2f == 2L * 1 * 1000000 / (1 + 3))
  }

  test("genMetrics: empty candidate/reference sides are null/zero, never NaN or a /0 error") {
    // an empty model output is a REALISTIC degenerate row (round-11
    // advice): BLEU of an empty candidate is -inf in log space -> NULL;
    // every ROUGE ratio zero-guards its own denominator
    val df = Seq(
      (1L, Seq.empty[String], Seq("a", "b")),
      (2L, Seq("a", "b"), Seq.empty[String]),
      (3L, Seq.empty[String], Seq.empty[String])
    ).toDF("id", "cand", "ref")
    val out = Evals.genMetrics(df, "id", "cand", "ref")
      .select("id", "log_bleu_ppm", "rouge1_f_ppm", "rouge1_p_ppm",
        "rouge1_r_ppm")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(1), "empty candidate: BLEU undefined -> null")
    assert(out(1L).getLong(2) == 0L && out(1L).getLong(3) == 0L &&
      out(1L).getLong(4) == 0L)
    assert(!out(2L).isNullAt(1), "empty REFERENCE keeps a finite log-BLEU " +
      "(BP caps at 0; smoothed p_n stay positive)")
    assert(out(2L).getLong(2) == 0L && out(2L).getLong(3) == 0L &&
      out(2L).getLong(4) == 0L)
    assert(out(3L).isNullAt(1) && out(3L).getLong(2) == 0L &&
      out(3L).getLong(3) == 0L && out(3L).getLong(4) == 0L)
  }

  test("rougeL: CLRS LCS fixture exact; order sensitivity ROUGE-1 lacks; degenerate zeros") {
    val df = Seq(
      // the classic CLRS 15.4 fixture: X=ABCBDAB, Y=BDCABA -> LCS 4
      (1L, "a b c b d a b".split(" ").toSeq, "b d c a b a".split(" ").toSeq),
      // same multiset, reversed order: ROUGE-1 scores this perfect
      (2L, "e d c b a".split(" ").toSeq, "a b c d e".split(" ").toSeq),
      (3L, Seq.empty[String], Seq("a"))
    ).toDF("id", "cand", "ref")
    val out = Evals.rougeL(df, "id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("lcs") == 4L)
    assert(out(1L).getAs[Long]("rouge_l_f_ppm") == 2L * 4 * 1000000 / 13)
    assert(out(1L).getAs[Long]("rouge_l_p_ppm") == 4L * 1000000 / 7)
    assert(out(1L).getAs[Long]("rouge_l_r_ppm") == 4L * 1000000 / 6)
    assert(out(2L).getAs[Long]("lcs") == 1L,
      "reversal collapses the LCS to 1 - the order signal ROUGE-N cannot see")
    assert(out(3L).getAs[Long]("lcs") == 0L &&
      out(3L).getAs[Long]("rouge_l_p_ppm") == 0L &&
      out(3L).getAs[Long]("rouge_l_f_ppm") == 0L)
  }

  test("poissonBootstrap: mirrored md5 weights reproduce every replicate; CI is the stated selection") {
    val docs = (1L to 50L).map(i => (i, i * 10L)).toDF("id", "x")
    val out = Evals.poissonBootstrap(docs, "id", "x", b = 8, seed = "s")
      .collect().map(r => r.getLong(0) -> r).toMap
    def u(i: Long, rep: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$i:$rep".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(6), 16) % 1000000L
    }
    def w(uu: Long): Long = {
      val i = Evals.poissonPpmThresholds.indexWhere(uu < _)
      if (i < 0) Evals.poissonPpmThresholds.length.toLong else i.toLong
    }
    val means = (1L to 8L).map { rep =>
      val ws = (1L to 50L).map(i => (w(u(i, rep)), i * 10L))
      val neff = ws.map(_._1).sum
      val mean = (BigInt(ws.map { case (wt, x) => wt * x }.sum) *
        1000000 / neff).toLong
      assert(out(rep).getAs[Long]("n_eff") == neff, s"rep $rep n_eff")
      assert(out(rep).getAs[Long]("mean_fp") == mean, s"rep $rep mean")
      mean
    }
    // b=8: nearest-rank 2.5%/97.5% = ranks 1 and 8 of the sorted means
    assert(out(1L).getAs[Long]("ci_lo_fp") == means.min)
    assert(out(1L).getAs[Long]("ci_hi_fp") == means.max)
    assert(means.min < means.max, "fixture must yield a real interval")
  }

  test("rbo: identical lists hit the exact truncated mass; reversal collapses top-weightedly") {
    val a = (1L to 10L).toSeq
    val df = Seq(
      (1L, a, a),
      (2L, a, a.reverse),
      (3L, a, (11L to 20L).toSeq)
    ).toDF("id", "a", "b")
    val out = Evals.rbo(df, "id", "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical lists: RBO@10 = 1 - 0.9^10 = 6513215599/10^10 EXACTLY
    assert(out(1L) == ((10L, 651321L)))
    assert(out(3L) == ((0L, 0L)), "disjoint lists score zero")
    val (ov2, rbo2) = out(2L)
    assert(ov2 == 10L && rbo2 < 651321L / 2,
      "a reversed ranking keeps overlap@k=10 yet loses most top-weighted " +
        "mass - the signal plain overlap lacks")
    // mirrored BigInt replay of the reversal case, cell by cell
    val (cs, dd) = Evals.rboCoefficients(10, 9, 10)
    val rev = a.reverse
    val ovs = (1 to 10).map(d => a.take(d).toSet.intersect(rev.take(d).toSet).size)
    val expected = (cs.zip(ovs).map { case (c, o) => c * o }.sum / dd).toLong
    assert(rbo2 == expected)

    // a too-short ranking fails loudly instead of silently repeating the
    // last overlap
    val short = Seq((1L, (1L to 5L).toSeq, a)).toDF("id", "a", "b")
    val e = intercept[Exception] {
      Evals.rbo(short, "id", "a", "b").collect()
    }
    assert(e.getMessage != null)

    // the guard must survive column pruning: a projection keeping ONLY
    // overlap_at_k (rbo_ppm dropped) still fails on short rankings
    val e2 = intercept[Exception] {
      Evals.rbo(short, "id", "a", "b").select("id", "overlap_at_k").collect()
    }
    assert(e2.getMessage != null)
  }

  test("poissonBootstrap: fractional valueCol is rejected, not truncated") {
    val frac = Seq((1L, 0.5), (2L, 0.7)).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      Evals.poissonBootstrap(frac, "id", "x", b = 8)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("chrF: perfect/disjoint extremes; asymmetric case matches the stated integer formula") {
    val df = Seq(
      (1L, "abc abc", "abc abc"), // identical after the space strip
      (2L, "ab", "xy"),           // fully disjoint
      (3L, "ab", "abcd")          // candidate a strict prefix
    ).toDF("id", "cand", "ref")
    val out = Evals.chrF(df, "id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("c_chars") == 6L)
    assert(out(1L).getAs[Long]("chrf_ppm") == 1000000L,
      "every order P=R=1 on an identical pair")
    assert(out(2L).getAs[Long]("chrf_ppm") == 0L)
    // hand replay of the stated quantization for cand="ab", ref="abcd":
    // p1=1e6, p2=1e6 (orders 3..6 have no candidate grams -> 0);
    // r1=2e6/4, r2=1e6/3, orders 3..6 match nothing -> 0
    val chrp = (1000000L + 1000000L) / 6
    val chrr = (2000000L / 4 + 1000000L / 3) / 6
    val chrf = (5 * chrp * chrr) / (4 * chrp + chrr)
    assert(out(3L).getAs[Long]("chrp_ppm") == chrp)
    assert(out(3L).getAs[Long]("chrr_ppm") == chrr)
    assert(out(3L).getAs[Long]("chrf_ppm") == chrf)
    assert(chrf < chrp && chrf > chrr,
      "beta=2 pulls the F-score toward recall - the chrF weighting")
  }

  test("passAtK: k past the long-safe bound is rejected up front; k=11 worst case exact") {
    val t = Seq((1L, 20L, 0L)).toDF("task", "n", "c")
    val e = intercept[IllegalArgumentException] {
      Evals.passAtK(t, "task", "n", "c", Seq(12))
    }
    assert(e.getMessage.contains("k<=11"),
      s"guard must name the bound: ${e.getMessage}")
    // the worst permitted case (n=20, c=0, k=11): prod(20,11)*1e6 = 6.7e18
    // — inside a long by 27%; c=0 makes the ratio exactly 1 -> pass 0
    val out = Evals.passAtK(t, "task", "n", "c", Seq(11))
      .select("pass11_ppm").as[Long].collect().head
    assert(out == 0L)
  }

  test("fleissKappa: single-category unanimity is undefined and fails with the statistics") {
    val lab = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 0L)).toDF("item", "cat")
    val e = intercept[IllegalArgumentException] {
      Evals.fleissKappa(lab, "item", "cat")
    }
    assert(e.getMessage.contains("kappa undefined"),
      s"must explain WHY, not throw a bare ArithmeticException: ${e.getMessage}")
  }

  test("calibration: planted violation pools; ECE/Brier match hand computation; empty bins absent") {
    // bins=4: bin0 acc 1.0 > bin1 acc 0.0 is a monotonicity violation the
    // isotonic fit must POOL to (2+0)/(2+2)=0.5; bin2 is empty and must
    // not appear; bin3 is already isotone above the pooled pair.
    val scored = Seq(
      (100000L, 1L), (100000L, 1L),
      (300000L, 0L), (300000L, 0L),
      (900000L, 1L)
    ).toDF("score_ppm", "label")
    val out = Evals.calibration(scored, "score_ppm", "label", bins = 4)
      .select("bin", "n", "pos", "conf_ppm", "acc_ppm", "iso_ppm",
        "ece_ppm", "brier_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 3L), "empty bin 2 must vanish")
    val Array(b0, b1, b3) = out
    assert(b0 == ((0L, 2L, 2L, 100000L, 1000000L, 500000L, 500000L, 362000L)))
    assert(b1 == ((1L, 2L, 0L, 300000L, 0L, 500000L, 500000L, 362000L)))
    assert(b3 == ((3L, 1L, 1L, 900000L, 1000000L, 1000000L, 500000L, 362000L)))
  }

  test("passAtK: matches hand-computed binomial ratios; edge branches exact") {
    val tasks = Seq(
      (1L, 5L, 2L),   // pass@1 = 1 - 3/5 = 0.4; pass@5: n-c=3<5 -> 1.0
      (2L, 10L, 0L),  // no passes -> 0 at every k <= n
      (3L, 20L, 20L), // all pass -> 1.0 everywhere
      (4L, 10L, 1L)   // pass@10: n-c=9<10 -> 1.0; pass@5 = 1 - C(9,5)/C(10,5)
    ).toDF("task", "n", "c")
    val out = Evals.passAtK(tasks, "task", "n", "c", Seq(1, 5, 10))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5, r._6)).toMap
    assert(out(1L) == ((400000L, 1000000L, 1000000L)))
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((1000000L, 1000000L, 1000000L)))
    // C(9,5)=126, C(10,5)=252 -> pass@5 = 1 - 1/2
    assert(out(4L) == ((100000L, 500000L, 1000000L)))
  }

  test("passAtK: out-of-domain n fails loudly instead of overflowing") {
    val bad = Seq((1L, 25L, 3L)).toDF("task", "n", "c")
    val e = intercept[Exception] {
      Evals.passAtK(bad, "task", "n", "c", Seq(1)).collect()
    }
    assert(e.getMessage != null)
  }

  test("fleissKappa: hand-computed fixture; perfect and negative agreement extremes") {
    // 2 raters, 2 items: item 1 agrees on cat 0, item 2 splits 0/1.
    // S = 2+0 = 2; P = 2/(2*2*1) = 0.5; marginals m0=3, m1=1;
    // Pe = (9+1)/16 = 0.625; kappa = (0.5-0.625)/0.375 = -1/3
    val lab = Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 1L)).toDF("item", "cat")
    val out = Evals.fleissKappa(lab, "item", "cat")
      .select("category", "n_labels", "marginal_ppm", "p_bar_ppm",
        "p_e_ppm", "kappa_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 3L, 750000L, 500000L, 625000L, -333334L)))
    assert(out(1)._1 == 1L && out(1)._2 == 1L && out(1)._3 == 250000L)
    // floor of -1/3 ppm is -333334, NOT -333333: true floor semantics

    // unanimous panel: kappa = 1 exactly
    val perfect = Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)).toDF("item", "cat")
    val k1 = Evals.fleissKappa(perfect, "item", "cat")
      .select("kappa_ppm").as[Long].collect().head
    assert(k1 == 1000000L)
  }

  test("fleissKappa: ragged rater counts fail loudly") {
    val lab = Seq((1L, 0L), (1L, 0L), (2L, 1L)).toDF("item", "cat")
    intercept[IllegalArgumentException] {
      Evals.fleissKappa(lab, "item", "cat").collect()
    }
  }

  test("calibration: already-isotone accuracies pass through the fit unchanged") {
    val scored = Seq(
      (100000L, 0L), (100000L, 0L), (100000L, 1L), (100000L, 1L),
      (600000L, 0L), (600000L, 1L), (600000L, 1L), (600000L, 1L)
    ).toDF("score_ppm", "label")
    val out = Evals.calibration(scored, "score_ppm", "label", bins = 2)
      .select("bin", "acc_ppm", "iso_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 500000L, 500000L), (1L, 750000L, 750000L)))
  }

  test("attribution: hand-computed support/quote; reversal keeps bag " +
    "support but collapses quote; empty answer gets its own verdict") {
    import org.apache.spark.sql.functions.{col, split}
    val ctx = "the cat sat on the mat today"
    val pairs = Seq(
      (1L, "cat sat on", ctx),              // verbatim slice: 3/3, lcs 3
      (2L, "on sat cat", ctx),              // reversed: bag 3/3, lcs 1
      (3L, "cat zz qq ww", ctx),            // 1/4 supported
      (4L, "zz qq", ctx),                   // 0 supported
      (5L, "", ctx),                        // empty answer
      (6L, "the the the", ctx)              // clipping: ctx has 'the' x2
    ).toDF("id", "a", "c")
      .select(col("id"),
        split(col("a"), " ").as("ans"), split(col("c"), " ").as("ctx"))
      .withColumn("ans",
        org.apache.spark.sql.functions.filter(col("ans"),
          t => org.apache.spark.sql.functions.length(t) > 0))
    val out = Evals.attribution(pairs, "id", "ans", "ctx")
      .select("id", "supported_toks", "lcs", "support_ppm", "quote_ppm",
        "unsupported", "verdict")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(1L) == ((3L, 3L, 1000000L, 1000000L, 0L, "supported")))
    assert(out(2L) == ((3L, 1L, 1000000L, 333333L, 0L, "supported")),
      "bag support survives a shuffle; quote_ppm exposes it")
    assert(out(3L) == ((1L, 1L, 250000L, 250000L, 3L, "hallucinated")))
    assert(out(4L) == ((0L, 0L, 0L, 0L, 2L, "hallucinated")))
    assert(out(5L)._6 == "empty")
    // clipping: answer 'the' x3 vs context 'the' x2 -> supported 2 of 3
    assert(out(6L) == ((2L, 2L, 666666L, 666666L, 1L, "partial")))
  }

  test("genDiversity: hand-computed distinct-n and top-share; gram-less " +
    "orders report zeros, never drop") {
    val df = Seq(
      ("A", "a a b"), ("A", "a b"), // 1g: 5 total / 2 distinct / top a=3
      ("B", "x")                    // 1g only; no 2- or 3-grams
    ).toDF("grp_in", "text")
    val out = Evals.genDiversity(df, "grp_in", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out.size == 6, "grid = 2 groups x 3 orders")
    assert(out(("A", 1L)) == ((5L, 2L, 400000L, 600000L)))
    // 2-grams of A: "a a","a b" + "a b" -> 3 total, 2 distinct, top 2
    assert(out(("A", 2L)) == ((3L, 2L, 666666L, 666666L)))
    assert(out(("A", 3L)) == ((1L, 1L, 1000000L, 1000000L)))
    assert(out(("B", 1L)) == ((1L, 1L, 1000000L, 1000000L)))
    assert(out(("B", 2L)) == ((0L, 0L, 0L, 0L)), "honest zeros")
    assert(out(("B", 3L)) == ((0L, 0L, 0L, 0L)))
  }

  test("rankCorr: hand-computed Kendall/Spearman on a 4-permutation; " +
    "identity and reversal hit the [0, 1e6] endpoints") {
    // id 1: rb = (2,1,4,3) vs ra = (1,2,3,4): C=4 D=2 -> tau = 1/3,
    // sum_d2 = 4 -> rho = 0.6; id 2 identity; id 3 full reversal.
    val ranks = Seq(
      (1L, 10L, 1L, 2L), (1L, 11L, 2L, 1L), (1L, 12L, 3L, 4L), (1L, 13L, 4L, 3L),
      (2L, 10L, 1L, 1L), (2L, 11L, 2L, 2L),
      (3L, 10L, 1L, 4L), (3L, 11L, 2L, 3L), (3L, 12L, 3L, 2L), (3L, 13L, 4L, 1L)
    ).toDF("id", "item", "ra", "rb")
    val out = Evals.rankCorr(ranks, "id", "item", "ra", "rb")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(out(1L) == ((4L, 4L, 2L, 4L, 4L, 666666L, 800000L)))
    assert(out(2L) == ((2L, 1L, 0L, 0L, 0L, 1000000L, 1000000L)))
    assert(out(3L) == ((4L, 0L, 6L, 20L, 8L, 0L, 0L)),
      "reversal: tau01 and rho01 both hit 0 exactly")
  }

  test("rankCorr: a single-item id raises (metrics undefined), even when " +
    "only one ppm column survives projection") {
    val ranks = Seq((1L, 10L, 1L, 1L)).toDF("id", "item", "ra", "rb")
    val thrown = intercept[Exception] {
      Evals.rankCorr(ranks, "id", "item", "ra", "rb")
        .select("tau01_ppm").collect()
    }
    assert(thrown.getMessage.contains("rankCorr needs"))
  }

  test("aucReport: Mann-Whitney midranks by hand -- a tie contributes " +
    "exactly half a win; single-class group reads NULL, never a number") {
    // g: pos scores (3, 2), neg (1, 2): U = 3.5 -> 2U = 7, AUC = 0.875.
    val scored = Seq(
      ("g", 1L, 3L), ("g", 1L, 2L), ("g", 0L, 1L), ("g", 0L, 2L),
      ("h", 1L, 5L), ("h", 0L, 1L), // separable: AUC = 1
      ("i", 0L, 4L), ("i", 0L, 2L)  // no positives: undefined
    ).toDF("grp_in", "lab", "score")
    val out = Evals.aucReport(scored, "grp_in", "lab", "score")
      .select("grp", "n_pos", "n_neg", "u2", "auc_ppm")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out("g") == ((2L, 2L, 7L, 875000L)))
    assert(out("h") == ((1L, 1L, 2L, 1000000L)))
    assert(out("i") == ((0L, 2L, 0L, -1L)), "NULL auc for one-class group")
  }

  test("pairedPermTest: equals an independent MessageDigest sign-flip " +
    "replay; identical systems read p = 1 exactly") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(rep: Long, id: Long): Boolean = {
      val hex = md.digest(s"perm:$rep:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 2 == 0
    }
    val rows = (1L to 20L).map(i => (i, 100L + i * 3, 90L + i * 2))
    val deltas = rows.map { case (i, a, b) => (i, a - b) }
    val obs = deltas.map(_._2).sum
    val b = 16
    val ne = (1 to b).count { r =>
      math.abs(deltas.map { case (i, d) =>
        if (coin(r, i)) d else -d
      }.sum) >= math.abs(obs)
    }
    val out = Evals.pairedPermTest(rows.toDF("id", "a", "b"),
        "id", "a", "b", b = b)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((20L, obs, b.toLong, ne.toLong,
      ((1L + ne) * 1000000L) / (b + 1))))
    val same = Evals.pairedPermTest(
        rows.map(r => (r._1, r._2, r._2)).toDF("id", "a", "b"),
        "id", "a", "b", b = 8)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(same._2 == 0L && same._4 == 8L && same._5 == 1000000L,
      "zero observed difference: every replicate is as extreme, p = 1")
  }

  test("integral-input guards: fractional scores/deltas and out-of-domain " +
    "labels fail loudly, never truncate (the poissonBootstrap rule)") {
    val frac = Seq(("g", 1L, 0.7)).toDF("grp_in", "lab", "score")
    val e1 = intercept[IllegalArgumentException] {
      Evals.aucReport(frac, "grp_in", "lab", "score")
    }
    assert(e1.getMessage.contains("integral"))
    val badLab = Seq(("g", 2L, 3L), ("g", 0L, 1L))
      .toDF("grp_in", "lab", "score")
    val e2 = intercept[Exception] {
      Evals.aucReport(badLab, "grp_in", "lab", "score").collect()
    }
    assert(e2.getMessage.contains("labels must be 0/1"))
    val e3 = intercept[IllegalArgumentException] {
      Evals.pairedPermTest(Seq((1L, 0.5, 0.4)).toDF("id", "a", "b"),
        "id", "a", "b")
    }
    assert(e3.getMessage.contains("integral"))
    val e4 = intercept[IllegalArgumentException] {
      Evals.rankCorr(Seq((1L, 10L, 1.0, 2.0)).toDF("id", "item", "ra", "rb"),
        "id", "item", "ra", "rb")
    }
    assert(e4.getMessage.contains("integral"))
  }

  test("mcnemar: hand-computed contingency + corrected statistic; " +
    "direction only past the critical value; no-discordance NULL; " +
    "non-binary outcomes raise") {
    import spark.implicits._
    def run(pairs: Seq[(Long, Long)]) = graft.operators.Evals.mcnemar(
      pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b"), "id", "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Long], Long, String)]
      .collect().head
    // both_right 2, a_only 6, b_only 1, both_wrong 1:
    // χ² = (|6−1|−1)²·1e6 / 7 = 16e6/7 = 2285714 — under 3.841: refuse
    val weak = run(Seq((1L, 1L), (1L, 1L), (1L, 0L), (1L, 0L), (1L, 0L),
      (1L, 0L), (1L, 0L), (1L, 0L), (0L, 1L), (0L, 0L)))
    assert(weak == ((10L, 2L, 1L, 6L, 1L, Some(2285714L), 3841000L,
      "no_significant_difference")))
    // a_only 15 vs b_only 1: (|15−1|−1)²·1e6/16 = 169e6/16 = 10562500 —
    // fires, a_better
    val strong = run(Seq.fill(15)((1L, 0L)) :+ ((0L, 1L)))
    assert(strong._6.contains(10562500L) && strong._8 == "a_better")
    val tied = run(Seq((1L, 1L), (0L, 0L)))
    assert(tied._6.isEmpty && tied._8 == "no_discordance")
    val bad = intercept[Exception] {
      graft.operators.Evals.mcnemar(
        Seq((1L, 2L, 1L)).toDF("id", "a", "b"), "id", "a", "b").collect()
    }
    assert(bad.getMessage.contains("must be 0/1"))
    // the pairing key is asserted unique: a duplicated item would count
    // one disagreement twice and silently inflate the discordance
    val dup = intercept[Exception] {
      graft.operators.Evals.mcnemar(
        Seq((1L, 1L, 0L), (1L, 1L, 0L), (2L, 0L, 1L))
          .toDF("id", "a", "b"), "id", "a", "b").collect()
    }
    assert(dup.getMessage.contains("duplicate 'id'"))
    // a NULL pairing key is named as such — countDistinct skips NULLs,
    // so without the dedicated check a unique-but-null id would trip
    // the duplicate raise with a misleading message
    val nul = intercept[Exception] {
      graft.operators.Evals.mcnemar(
        Seq((Some(1L), 1L, 0L), (None, 0L, 1L), (Some(3L), 1L, 1L))
          .toDF("id", "a", "b"), "id", "a", "b").collect()
    }
    assert(nul.getMessage.contains("NULL 'id' pairing key"),
      s"null key must be named, got: ${nul.getMessage.take(120)}")
  }

  test("mannWhitney: hand-computed 2U/ties on a midrank fixture; clean " +
    "separation fires with direction both ways; all-tied degenerates; " +
    "guards are loud") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)]) =
      graft.operators.Evals.mannWhitney(
        rows.toDF("grp", "a", "v"), "grp", "a", "v")
        .as[(String, Long, Long, Long, Long, Long, Option[Long],
          Option[Long], String)]
        .collect().map(r => r._1 -> r).toMap
    // A={1,3,3}, B={2,3}: pairwise A-wins 2, ties 2 -> 2U=6; mu2=6;
    // tie group t=3 at v=3 -> T=24; var_num=6*(120-24)=576, den=240,
    // z = 0/sqrt(2.4) = 0
    val out = run(Seq(("g", 1L, 1L), ("g", 1L, 3L), ("g", 1L, 3L),
      ("g", 0L, 2L), ("g", 0L, 3L)))
    assert(out("g") == (("g", 3L, 2L, 6L, 6L, 24L, Some(0L), Some(0L),
      "no_significant_shift")), s"got: ${out("g")}")
    // 20 vs 20 cleanly separated: 2U=2*400=800, mu2=400, T=0,
    // z = 200/sqrt(400*(64000-40)/(12*40*39)) = 200/sqrt(400*63960/18720)
    val hi = (1L to 20L).map(i => ("s", 1L, 100L + i)) ++
      (1L to 20L).map(i => ("s", 0L, i))
    val his = run(hi)
    assert(his("s")._4 == 800L && his("s")._5 == 400L &&
      his("s")._9 == "a_high" && his("s")._8.exists(_ > 1960L))
    assert(his("s")._7.contains(1000000L),
      "clean separation: Cliff's delta exactly +1")
    // mirrored: B dominates
    val lo = run(hi.map { case (g, a, v) => (g, 1L - a, v) })
    assert(lo("s")._9 == "b_high" && lo("s")._8.exists(_ < -1960L))
    assert(lo("s")._7.contains(-1000000L))
    // symmetric z: the mirrored statistic is the exact negation shifted
    // by floor (floor(-x) = -floor(x)-1 off lattice)
    assert(his("s")._8.get + lo("s")._8.get == -1L)
    // every value tied across both samples: variance 0, honest NULL z,
    // but delta is still defined (all pairs tie -> exactly 0)
    val deg = run(Seq(("d", 1L, 7L), ("d", 0L, 7L), ("d", 1L, 7L)))
    assert(deg("d")._8.isEmpty && deg("d")._9 == "degenerate" &&
      deg("d")._7.contains(0L))
    // single-class group (all A): mu2 = 0 -> no pairs, delta NULL too
    val one = run(Seq(("o", 1L, 1L), ("o", 1L, 2L)))
    assert(one("o")._9 == "degenerate" && one("o")._7.isEmpty)
    val badMark = intercept[Exception] {
      run(Seq(("x", 2L, 1L), ("x", 0L, 2L)))
    }
    assert(badMark.getMessage.contains("0/1"))
    val tiny = intercept[Exception] {
      run(Seq(("t", 1L, 5L)))
    }
    assert(tiny.getMessage.contains("outside [2, 3e9]"))
    val frac = intercept[Exception] {
      graft.operators.Evals.mannWhitney(
        Seq(("f", 1L, 0.5)).toDF("grp", "a", "v"), "grp", "a", "v")
    }
    assert(frac.getMessage.contains("integral"))
  }

  test("krippendorffAlpha: hand-computed ragged fixture; single-rating " +
    "items drop; negative alpha floors identically; guards are loud") {
    import spark.implicits._
    // u1 [1,1] agrees, u2 [1,2] splits, u3 [2,2,2] agrees, u4 [3] drops:
    // N=7, Σd_u = 2, D_e num = 49−(9+16) = 24 → α = 1 − 6·2/24 = 0.5
    val lab = Seq(("u1", 1L), ("u1", 1L), ("u2", 1L), ("u2", 2L),
      ("u3", 2L), ("u3", 2L), ("u3", 2L), ("u4", 3L)).toDF("it", "cat")
    val out = graft.operators.Evals.krippendorffAlpha(lab, "it", "cat")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L), "category 3 is unpairable-only")
    assert(out(1L) == ((1L, 3L, 428571L, 7L, 1L, 285714L, 571428L, 500000L)))
    assert(out(2L)._2 == 4L && out(2L)._8 == 500000L)
    // perfect systematic disagreement: α = −0.5, floored consistently
    val neg = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 1L)).toDF("it", "cat")
    assert(graft.operators.Evals.krippendorffAlpha(neg, "it", "cat")
      .select("alpha_ppm").distinct().as[Long].collect().toSeq ==
      Seq(-500000L))
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Evals.krippendorffAlpha(
        Seq(("a", 1L), ("a", 1L)).toDF("it", "cat"), "it", "cat")
    }
    assert(e1.getMessage.contains("expected disagreement is 0"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Evals.krippendorffAlpha(
        Seq(("a", 1L), ("b", 2L)).toDF("it", "cat"), "it", "cat")
    }
    assert(e2.getMessage.contains("nothing is pairable"))
    // 60 distinct panel sizes: Π(n−1) = 60! blows the replay bound
    val wide = (1 to 60).flatMap(i =>
      (0 to i).map(j => (s"w$i", (j % 3).toLong))).toDF("it", "cat")
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Evals.krippendorffAlpha(wide, "it", "cat")
    }
    assert(e3.getMessage.contains("exact-rational replay bound"))
  }

  test("fdrBh: hand-computed step-up boundary; the signature " +
    "reject-via-later-rank behavior; range guard is loud") {
    import spark.implicits._
    // m=6, alpha 0.05: un-floored compares p·6 vs r·50000 — ranks 1-4 pass
    // (30000·6 = 180000 <= 200000), rank 5 fails (200000·6 > 250000)
    val battery = Seq(("t1", 1000L), ("t2", 10000L), ("t3", 20000L),
      ("t4", 30000L), ("t5", 200000L), ("t6", 900000L)).toDF("test", "p_ppm")
    val out = graft.operators.Evals.fdrBh(battery, "test", "p_ppm")
      .as[(String, Long, Int, Long, Long, Boolean)].collect().sortBy(_._3)
    assert(out.map(r => (r._1, r._3, r._5, r._6)).toSeq == Seq(
      ("t1", 1, 8333L, true), ("t2", 2, 16666L, true),
      ("t3", 3, 25000L, true), ("t4", 4, 33333L, true),
      ("t5", 5, 41666L, false), ("t6", 6, 50000L, false)))
    assert(out.forall(_._4 == 6L))
    // step-up signature: every rank fails its OWN threshold except the
    // last, and the last rescues all of them (Bonferroni/step-down would
    // reject none)
    val su = Seq(("a", 40000L), ("b", 41000L), ("c", 42000L))
      .toDF("test", "p_ppm")
    val suOut = graft.operators.Evals.fdrBh(su, "test", "p_ppm")
      .as[(String, Long, Int, Long, Long, Boolean)].collect()
    assert(suOut.forall(_._6), "42000*3 <= 3*50000 rescues ranks 1 and 2")
    // same battery, worst p nudged past its threshold: nothing rejects
    val none = Seq(("a", 40000L), ("b", 41000L), ("c", 900000L))
      .toDF("test", "p_ppm")
    assert(graft.operators.Evals.fdrBh(none, "test", "p_ppm")
      .filter(org.apache.spark.sql.functions.col("rejected")).count() == 0L,
      "40000*3 > 1*50000 and no later rank rescues")
    val bad = intercept[Exception] {
      graft.operators.Evals.fdrBh(
        Seq(("a", 2000000L)).toDF("test", "p_ppm"), "test", "p_ppm")
        .collect()
    }
    assert(bad.getMessage.contains("out of [0, 1e6]"))
  }

  test("ragasReport: hand-computed context precision (lcm weights) and " +
    "token-overlap faithfulness; beyond-k contexts ignored; zero branches") {
    // query 1 at k=5: relevant at ranks 1, 3, 4 ->
    // CP = (1/1 + 2/3 + 3/4) / 3 = 29/36; with L = lcm(1..5) = 60 the
    // exact terms are 1*1*60 + 1*2*20 + 1*3*15 = 145, so
    // cp_ppm = 145e6 div (60*3) = 805555. A rank-6 relevant context must
    // NOT count (rank > k). Faithfulness: claims {the, cat, sat}; the
    // contexts carry "the" and "cat" (case/whitespace-normalized) but
    // never "sat" -> 2*1e6 div 3 = 666666.
    val contexts = Seq(
      (1L, 1, 100L, "The  cat"), (1L, 2, 200L, "dog"),
      (1L, 3, 101L, "THE"), (1L, 4, 102L, "mat mat"),
      (1L, 5, 201L, "bird"), (1L, 6, 103L, "sat"),
      (2L, 1, 300L, "x y z"), (2L, 2, 301L, "w")
    ).toDF("query_id", "rank", "id", "content")
    val relevant = Seq((1L, 100L), (1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 999L)).toDF("query_id", "id")
    val answers = Seq((1L, "the CAT sat"), (2L, "  ")).toDF("query_id", "answer")
    val out = Evals.ragasReport(contexts, relevant, answers, k = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 5L, 3L, 805555L, 3L, 2L, 666666L)),
      s"got ${out(1L)}")
    // query 2: zero relevant in k -> cp 0 with rel_in_k 0; blank answer
    // -> zero claims -> faithfulness 0 with n_claims 0
    assert(out(2L) == ((2L, 2L, 0L, 0L, 0L, 0L, 0L)), s"got ${out(2L)}")
    val bad = intercept[IllegalArgumentException] {
      Evals.ragasReport(contexts, relevant, answers, k = 21)
    }
    assert(bad.getMessage.contains("1<=k<=20"))
  }

  test("erExtractionReport: hand-computed strict/boundary/unlabeled cells; " +
    "set semantics dedupe repeated predictions; invalid span raises") {
    // gold: spans {0, 2, 5}; pred: 0 exact (strict TP), 2 with flipped
    // type (boundary-only TP), 7 spurious (FP), 5 dropped (FN) — plus the
    // exact-TP tuple REPEATED, which set semantics must count once
    val goldE = Seq((1L, 0L, 0L, "A"), (1L, 2L, 2L, "B"), (1L, 5L, 5L, "A"))
      .toDF("doc_id", "s", "e", "etype")
    val predE = Seq((1L, 0L, 0L, "A"), (1L, 0L, 0L, "A"),
      (1L, 2L, 2L, "X"), (1L, 7L, 7L, "A"))
      .toDF("doc_id", "s", "e", "etype")
    // gold relations chain the gold entities; pred keeps the first with a
    // flipped type (unlabeled-only TP) and drops the second
    val goldR = Seq((1L, 0L, 0L, 2L, 2L, "R0"), (1L, 2L, 2L, 5L, 5L, "R1"))
      .toDF("doc_id", "hs", "he", "ts", "te", "rtype")
    val predR = Seq((1L, 0L, 0L, 2L, 2L, "R1"))
      .toDF("doc_id", "hs", "he", "ts", "te", "rtype")
    val out = Evals.erExtractionReport(goldE, predE, goldR, predR)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // strict: tp=1 of gold 3 / pred 3 (dedup!) -> all three metrics 1/3
    assert(out("entity_strict") ==
      (("entity_strict", 3L, 3L, 1L, 333333L, 333333L, 333333L)),
      s"got ${out("entity_strict")}")
    // boundary forgives the type flip: tp=2 -> 2/3 everywhere
    assert(out("entity_boundary") ==
      (("entity_boundary", 3L, 3L, 2L, 666666L, 666666L, 666666L)))
    // relation strict: the flipped type kills the only prediction
    assert(out("relation_strict") ==
      (("relation_strict", 2L, 1L, 0L, 0L, 0L, 0L)))
    // unlabeled: spans match -> P=1, R=1/2, F1=2/3
    assert(out("relation_unlabeled") ==
      (("relation_unlabeled", 2L, 1L, 1L, 1000000L, 500000L, 666666L)))
    val bad = intercept[Exception] {
      Evals.erExtractionReport(
        Seq((1L, 3L, 1L, "A")).toDF("doc_id", "s", "e", "etype"), predE,
        goldR, predR).collect()
    }
    assert(bad.getMessage.contains("invalid span"), bad.getMessage)
  }
}

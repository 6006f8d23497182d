package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{vec, TopKAggregate}

/** Training-pair mining for contrastive retrieval/embedding training — the
  * stage that turns a curated corpus into (query, positive, negatives)
  * triples. Random negatives teach a model nothing once it separates
  * topics; what moves retrieval quality is mining the negatives the model
  * currently confuses (DPR, Karpukhin et al. 2020; ANCE, Xiong et al.
  * 2021), and the classic semi-hard band (FaceNet, Schroff et al. 2015)
  * keeps them informative without label-noise poison.
  *
  * Label semantics: `labelCol` marks relevance groups (same label = same
  * topic/positive set — the embeddings table's `label`). A hard negative
  * is a DIFFERENT-label vector scoring high against the query; the
  * same-label exclusion is what separates this from plain batch KNN (v2) —
  * without it the top of every candidate list is positives and near-dup
  * false negatives.
  *
  * 100 TB shape: queries are a training batch — request-sized, broadcast.
  * [[hardNegatives]] is ONE corpus scan into per-query bounded-heap top-k
  * (TopKAggregate — never a global sort). [[semiHardNegatives]] is TWO
  * scans: pass 1 reduces to one pos_score row per query (map-side-combined
  * max), pass 2 re-broadcasts that |Q|-row table and band-filters into the
  * same bounded heap. Both stated; nothing quadratic, nothing driver-side
  * beyond the |Q|-bounded pass-1 result.
  */
object Mining {

  /** Top-`k` hardest negatives per query: highest-cosine corpus vectors
    * with a DIFFERENT label. Output: query_id, rank (1-based), neg_id,
    * score; ties break (score desc, id asc) — the v2 ordering. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queries: DataFrame, queryIdCol: String,
                    queryVecCol: String, queryLabelCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"hardNegatives needs k>=1 (got $k)")
    graft.Tables.scaled(corpus)
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"), col(queryLabelCol).as("__qlabel"))))
      .filter(col(labelCol) =!= col("__qlabel"))
      .withColumn("score", vec.cosine_sim(col(vecCol), col("__qvec")))
      .groupBy("query_id")
      .agg(TopKAggregate.top_k(col("score"), col(idCol).cast("long"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rank", "hit")))
      .select(col("query_id"), (col("rank") + 1).cast("long").as("rank"),
        col("hit.id").as("neg_id"), col("hit.score").as("score"))
  }

  /** Top-`k` SEMI-HARD negatives per query (the FaceNet band): different-
    * label vectors with pos_score − margin < score < pos_score, where
    * pos_score is the query's hardest positive (max same-label score,
    * self excluded). Negatives above the band are likely label noise;
    * below it, uninformative. Queries with no positive are dropped (no
    * band exists). Output: query_id, rank, neg_id, score, pos_score. */
  def semiHardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, queries: DataFrame, queryIdCol: String,
                        queryVecCol: String, queryLabelCol: String,
                        k: Int, margin: Double): DataFrame = {
    require(k >= 1, s"semiHardNegatives needs k>=1 (got $k)")
    require(margin > 0, s"semiHardNegatives needs margin>0 (got $margin)")
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qvec"), col(queryLabelCol).as("__qlabel")))
    val scored = graft.Tables.scaled(corpus).join(q)
      .withColumn("score", vec.cosine_sim(col(vecCol), col("__qvec")))
    val pos = scored
      .filter(col(labelCol) === col("__qlabel") &&
        col(idCol).cast("long") =!= col("query_id").cast("long"))
      .groupBy("query_id").agg(max(col("score")).as("pos_score"))
    scored.filter(col(labelCol) =!= col("__qlabel"))
      .join(broadcast(pos), Seq("query_id"))
      .filter(col("score") > col("pos_score") - lit(margin) &&
        col("score") < col("pos_score"))
      .groupBy(col("query_id"), col("pos_score"))
      .agg(TopKAggregate.top_k(col("score"), col(idCol).cast("long"), k).as("hits"))
      .select(col("query_id"), col("pos_score"),
        posexplode(col("hits")).as(Seq("rank", "hit")))
      .select(col("query_id"), (col("rank") + 1).cast("long").as("rank"),
        col("hit.id").as("neg_id"), col("hit.score").as("score"),
        col("pos_score"))
  }

  /** Contrastive training TRIPLETS (anchor, hardest positive, top-k hard
    * negatives) — the tuple a DPR/SimCSE/InfoNCE trainer actually
    * consumes, assembled from the two mining arms: the positive anchors
    * the similarity target, the [[hardNegatives]] rows make the batch
    * informative. ONE broadcast-join corpus scan serves both sides (the
    * per-anchor positive is the k=1 bounded heap over same-label,
    * self-excluded — deterministic (score desc, id asc) ties like every
    * top-k here); anchors with no positive drop (no triplet exists, the
    * [[semiHardNegatives]] contract). Output: anchor_id, pos_id,
    * pos_score, rank, neg_id, neg_score. */
  def triplets(corpus: DataFrame, idCol: String, vecCol: String,
               labelCol: String, queries: DataFrame, queryIdCol: String,
               queryVecCol: String, queryLabelCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"triplets needs k>=1 (got $k)")
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qvec"), col(queryLabelCol).as("__qlabel")))
    val scored = graft.Tables.scaled(corpus).join(q)
      .withColumn("score", vec.cosine_sim(col(vecCol), col("__qvec")))
    val pos = scored
      .filter(col(labelCol) === col("__qlabel") &&
        col(idCol).cast("long") =!= col("query_id").cast("long"))
      .groupBy("query_id")
      .agg(TopKAggregate.top_k(col("score"), col(idCol).cast("long"), 1).as("p"))
      .select(col("query_id"), col("p")(0).getField("id").as("pos_id"),
        col("p")(0).getField("score").as("pos_score"))
    val negs = scored.filter(col(labelCol) =!= col("__qlabel"))
      .groupBy("query_id")
      .agg(TopKAggregate.top_k(col("score"), col(idCol).cast("long"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rank", "hit")))
      .select(col("query_id"), (col("rank") + 1).cast("long").as("rank"),
        col("hit.id").as("neg_id"), col("hit.score").as("neg_score"))
    pos.join(negs, Seq("query_id"))
      .select(col("query_id").as("anchor_id"), col("pos_id"), col("pos_score"),
        col("rank"), col("neg_id"), col("neg_score"))
  }

  /** Bradley–Terry strength fitting from pairwise preference outcomes —
    * the preference-data aggregation math of RLHF reward modeling and
    * LLM-judge eval (Chatbot-Arena-style rankings): P(i beats j) =
    * p_i/(p_i+p_j), fit by Hunter's MM iteration (Hunter 2004, eq. 1.4;
    * Jacobi form — every update reads the PREVIOUS vector):
    *
    *   p'_i = W_i / Σ_{j≠i} n_ij/(p_i + p_j),  then p''_i = p'_i / Σ p'
    *
    * for `iters` rounds from p = 1. Comparison counts are smoothed with
    * half a win per direction on every observed pair (w±0.5, n+1) so a
    * shutout item keeps a finite strength.
    *
    * Determinism: the corpus-sized half is ONE map-side-combined groupBy
    * on the unordered item pair; the fit runs DRIVER-SIDE on the k×k pair
    * table (items = models/policies — request-sized by nature; rule-17
    * pull, the k6 centroid-distance precedent) with every float sum an
    * ascending-index left fold the oracle replays verbatim. Strengths are
    * emitted as floor(p·1e6) exact integers.
    *
    * Input rows: one comparison each — (aCol, bCol item ids, winACol
    * boolean). Returns (item, n_wins, n_comps, strength_fp). */
  def btStrengths(comparisons: DataFrame, aCol: String, bCol: String,
                  winACol: String, iters: Int = 20): DataFrame = {
    require(iters >= 1, s"iters >= 1 (got $iters)")
    val spark = comparisons.sparkSession
    import spark.implicits._
    // rule-17 guard, probed with limit(cap+1) so the DRIVER never holds
    // more than cap+1 rows even on the failing path (plStrengths' sibling
    // guard; a k-item universe makes up to k(k-1)/2 pairs, so cap=100k
    // admits ~450 items — far past any model/policy-eval panel)
    val pairCap = 100000
    val stats = comparisons.select(
        least(col(aCol), col(bCol)).cast("long").as("lo"),
        greatest(col(aCol), col(bCol)).cast("long").as("hi"),
        (col(winACol) === (col(aCol) < col(bCol))).as("lo_won"))
      .filter(col("lo") =!= col("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("n"),
        sum(col("lo_won").cast("long")).as("w_lo"))
      .limit(pairCap + 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    require(stats.length <= pairCap, s"btStrengths: more than $pairCap " +
      "distinct comparison pairs (item universe >~ " +
      s"${math.sqrt(2.0 * pairCap).toInt} items) - too large for the " +
      "rule-17 driver fit; pre-aggregate or shard the panel")
    val items = stats.flatMap { case ((l, h), _) => Seq(l, h) }
      .distinct.sorted
    val idx = items.zipWithIndex.toMap
    val m = items.length
    val nRaw = Array.ofDim[Long](m, m)
    val wRaw = Array.ofDim[Long](m, m)
    stats.foreach { case ((l, h), (n, wLo)) =>
      val (i, j) = (idx(l), idx(h))
      nRaw(i)(j) = n; nRaw(j)(i) = n
      wRaw(i)(j) = wLo; wRaw(j)(i) = n - wLo
    }
    // smoothed double matrices (the stated fit inputs)
    val nS = Array.tabulate(m, m)((i, j) =>
      if (nRaw(i)(j) > 0) nRaw(i)(j) + 1.0 else 0.0)
    val wS = Array.tabulate(m, m)((i, j) =>
      if (nRaw(i)(j) > 0) wRaw(i)(j) + 0.5 else 0.0)
    // W_i: ascending-j left fold
    val bigW = Array.tabulate(m)(i => wS(i).foldLeft(0.0)(_ + _))
    var p = Array.fill(m)(1.0)
    for (_ <- 1 to iters) {
      val pNew = Array.tabulate(m) { i =>
        val denom = (0 until m).foldLeft(0.0) { (acc, j) =>
          if (j == i) acc else acc + nS(i)(j) / (p(i) + p(j))
        }
        bigW(i) / denom
      }
      val s = pNew.foldLeft(0.0)(_ + _)
      p = pNew.map(_ / s)
    }
    items.indices.map { i =>
      (items(i), wRaw(i).sum, nRaw(i).sum,
        math.floor(p(i) * 1000000.0).toLong)
    }.toDF("item", "n_wins", "n_comps", "strength_fp")
  }

  /** Plackett–Luce strength fitting from LISTWISE rankings — the K-wise
    * generalization of [[btStrengths]] and the model the InstructGPT-style
    * RLHF pipelines fit when annotators rank K completions per prompt
    * instead of judging pairs: P(ranking) = Π_p γ_{r_p} / Σ_{j ∈
    * suffix(p)} γ_j. Fit by Hunter's MM (Hunter 2004 §2, Jacobi form):
    *
    *   γ'_i = W_i / Σ_{lists, positions q<K : i ∈ suffix(q)} 1/S(q),
    *   S(q) = Σ_{t ≥ q} γ_{r_t},   then normalize γ'' = γ'/Σγ'
    *
    * with W_i = #appearances of i in a NON-LAST position (the last choice
    * is from a singleton and carries no information). No smoothing (tr4's
    * half-win trick is pairwise-specific — stated): an item that never
    * wins fits γ → 0, which is the honest answer.
    *
    * Determinism: the corpus reduces to (ranking-pattern, count) — ONE
    * keyed groupBy per list then ONE bounded pattern groupBy; the fit runs
    * DRIVER-SIDE over patterns in LEXICOGRAPHIC pattern order (stated, and
    * the order the oracle's `list(... ORDER BY pi)` replays), every float
    * sum an ascending left fold: patterns outer, positions q ascending,
    * suffix t ascending. Strengths emit as floor(γ·1e6).
    *
    * 100 TB shape: rankings of the SAME item universe collapse to at most
    * |universe|! patterns (24 for 4 models) — request-sized by nature for
    * the model-eval use; the guard fails loudly if the pattern table
    * stops being request-sized rather than silently collecting a corpus.
    *
    * Input rows: (listIdCol, itemCol, posCol 1-based rank). Returns
    * (item, n_lists, n_wins, strength_fp). */
  def plStrengths(rankings: DataFrame, listIdCol: String, itemCol: String,
                  posCol: String, iters: Int = 20): DataFrame = {
    require(iters >= 1, s"iters >= 1 (got $iters)")
    val spark = rankings.sparkSession
    import spark.implicits._
    val raw = rankings.groupBy(col(listIdCol))
      .agg(sort_array(collect_list(struct(col(posCol).cast("long").as("p"),
        col(itemCol).cast("long").as("it")))).as("s"))
      .select(transform(col("s"), x => x.getField("it")).as("perm"))
      .groupBy("perm").agg(count(lit(1)).as("cnt"))
      .as[(Seq[Long], Long)].collect()
    require(raw.nonEmpty, "plStrengths: empty input")
    require(raw.length <= 100000, s"plStrengths: ${raw.length} distinct " +
      "ranking patterns - item universe too large for the rule-17 driver fit")
    // the item universe is recoverable from the collected patterns — no
    // second corpus job for a distinct()
    val itemsSorted = raw.flatMap(_._1).distinct.sorted
    val idx = itemsSorted.zipWithIndex.toMap
    val perms: Array[(Vector[Int], Long)] =
      raw.map { case (p, c) => (p.iterator.map(idx).toVector, c) }
    val m = itemsSorted.length
    // lexicographic pattern order — the shared fold order (oracle: ORDER BY pi)
    val ps = perms.sortWith { case ((a, _), (b, _)) =>
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) a(i) < b(i) else a.length < b.length
    }
    require(ps.exists(_._1.length >= 2),
      "plStrengths: need at least one ranking of length >= 2")
    val nLists = Array.tabulate(m)(i =>
      ps.collect { case (p, c) if p.contains(i) => c }.sum)
    val nWins = Array.tabulate(m)(i =>
      ps.collect { case (p, c) if p.dropRight(1).contains(i) => c }.sum)
    val bigW = Array.tabulate(m)(i => ps.foldLeft(0.0) { case (acc, (p, c)) =>
      if (p.dropRight(1).contains(i)) acc + c.toDouble else acc })
    var g = Array.fill(m)(1.0)
    for (_ <- 1 to iters) {
      val g2 = Array.tabulate(m) { i =>
        val den = ps.foldLeft(0.0) { case (acc, (p, c)) =>
          val k = p.length
          val posI = p.indexOf(i) + 1 // 0 when absent
          val inner = (1 until k).foldLeft(0.0) { (a, q) =>
            if (posI >= 1 && q <= posI) {
              val s = (q - 1 until k).foldLeft(0.0)((ss, t) => ss + g(p(t)))
              a + 1.0 / s
            } else a
          }
          acc + c.toDouble * inner
        }
        bigW(i) / den
      }
      val s = g2.foldLeft(0.0)(_ + _)
      g = g2.map(_ / s)
    }
    itemsSorted.indices.map(i => (itemsSorted(i), nLists(i), nWins(i),
      math.floor(g(i) * 1000000.0).toLong))
      .toDF("item", "n_lists", "n_wins", "strength_fp")
  }

  /** Expected-score table for [[eloRatings]]: e_ppm(d) =
    * ⌊10⁶/(1 + 10^(d/400))⌋ for the rating difference d = R_b − R_a
    * clamped to [−800, 800], indexed d + 800. Emitted from ONE Scala
    * function and interpolated verbatim into the oracle SQL (the t60
    * coefficient convention — the sides cannot drift), so the float pow
    * is evaluated exactly once, here; everything downstream is integer. */
  def eloExpectedPpm(): Array[Long] =
    Array.tabulate(1601) { i =>
      val d = i - 800
      math.floor(1000000.0 / (1.0 + math.pow(10.0, d / 400.0))).toLong
    }

  /** Online Elo ratings over an ORDERED match stream (Elo 1978; the
    * LMSYS-arena leaderboard convention before its move to the
    * order-free [[btStrengths]] fit — this operator is the sequential
    * complement: path-dependent, recency-sensitive, the rating a live
    * leaderboard actually shows between refits).
    *
    * Update per match, ALL integer arithmetic: d = clamp(R_b − R_a,
    * ±800), E_a from [[eloExpectedPpm]], S_a ∈ {10⁶, 0}, Δ =
    * (K·(S_a − E_a)) / 10⁶ (truncating division — Long `/`, Spark `div`
    * and DuckDB `//` all truncate toward zero), R_a += Δ, R_b −= Δ
    * (zero-sum). Output per item: `n_matches`, `wins`, `rating`,
    * `rank` by (rating desc, item asc).
    *
    * Elo is INHERENTLY sequential — each update reads the ratings the
    * previous match wrote — so this is a rule-17 driver replay with a
    * `limit(cap+1)` ordered probe (the btStrengths guard): the driver
    * never holds more than cap+1 match rows even on the failing path.
    * Real arena panels are match-bounded — LMSYS publishes its Elo on
    * ~10⁶ battles replayed on one machine, which is the default cap
    * (10⁶ × 32-byte tuples ≈ 32 MB of driver heap, the documented
    * bound); past the cap, refit with the order-free distributed
    * [[btStrengths]]/[[plStrengths]] instead — that trade is the
    * documented contract, not a scale gap. Duplicate order keys raise:
    * an ambiguous replay order would make the path-dependent result
    * nondeterministic. */
  def eloRatings(matches: DataFrame, aCol: String, bCol: String,
                 winACol: String, orderCol: String,
                 k: Long = 32L, init: Long = 1000L,
                 matchCap: Int = 1000000): DataFrame = {
    require(k > 0 && matchCap >= 1, s"eloRatings: k > 0, cap >= 1")
    // items and the order key all cast('long') into the driver replay —
    // a string id would cast to NULL silently, a timestamp order key
    // would truncate to seconds and manufacture duplicate-order failures
    Seq(aCol, bCol, orderCol).foreach(
      Guards.requireIntegral(matches, _, "eloRatings"))
    val spark = matches.sparkSession
    import spark.implicits._
    val rows = matches.select(col(orderCol).cast("long").as("o"),
        col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"),
        col(winACol).cast("boolean").as("w"))
      .filter(col("a") =!= col("b"))
      .orderBy(col("o").asc)
      .limit(matchCap + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    require(rows.length <= matchCap, s"eloRatings: more than $matchCap " +
      "matches - Elo's sequential replay is driver-bound by design; " +
      "refit with the order-free btStrengths/plStrengths at this scale")
    rows.iterator.sliding(2).withPartial(false).foreach { p =>
      require(p(0)._1 != p(1)._1, s"eloRatings: duplicate order key " +
        s"${p(0)._1} - the sequential replay would be nondeterministic")
    }
    val table = eloExpectedPpm()
    val r = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(init)
    val wins = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val n = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    rows.foreach { case (_, a, b, winA) =>
      val d = math.max(-800L, math.min(800L, r(b) - r(a)))
      val ea = table((d + 800).toInt)
      val s = if (winA) 1000000L else 0L
      val delta = (k * (s - ea)) / 1000000L
      r(a) = r(a) + delta
      r(b) = r(b) - delta
      n(a) += 1; n(b) += 1
      wins(if (winA) a else b) += 1
    }
    val items = n.keys.toSeq.sorted
    val rankOf = items.sortBy(i => (-r(i), i)).zipWithIndex
      .map { case (i, x) => i -> (x + 1L) }.toMap
    items.map(i => (i, n(i), wins(i), r(i), rankOf(i)))
      .toDF("item", "n_matches", "wins", "rating", "rank_pos")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Behavioral tests for the corpus-curation operators: the DuckDB oracles
  * (t10-t16) prove engine-equivalence; these prove the operators make the
  * right calls on planted inputs.
  */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("boilerplateNgrams finds the planted shared span only") {
    val boiler = "all rights reserved contact us"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"epsilon zeta eta theta $boiler"),
      (3L, s"iota kappa lambda mu $boiler"),
      (4L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text")
    val hits = Corpus.boilerplateNgrams(docs, "doc_id", "text", n = 4, minDocs = 3)
      .as[(String, Long)].collect().toMap
    // every 4-gram fully inside the planted span appears in 3 docs
    assert(hits.keySet == Set("all rights reserved contact", "rights reserved contact us"))
    assert(hits.values.forall(_ == 3L))
  }

  test("repetitionMetrics flags the repetitive doc and keeps the diverse one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam ham"),
      (2L, "the quick brown fox jumps over a lazy dog")).toDF("doc_id", "text")
    val m = Corpus.repetitionMetrics(docs, "doc_id", "text")
      .select("id", "n_tokens", "n_distinct", "top_token_count", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(m(0) == ((1L, 9L, 2L, 8L, false)))
    assert(m(1) == ((2L, 9L, 9L, 1L, true)))
  }

  test("decontaminate reports the contaminated train doc with its overlap count") {
    val evalDoc = "one two three four five six"
    val train = Seq(
      (10L, s"prefix words here $evalDoc"), // shares all 3 eval 4-grams
      (11L, "totally unrelated content with different words entirely"))
      .toDF("doc_id", "text")
    val eval_ = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val hits = Corpus.decontaminate(train, eval_, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toSeq
    assert(hits == Seq((10L, 3L)))
  }

  test("hashSample is deterministic and kept implies bucket under rate") {
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val s1 = Corpus.hashSample(docs, "doc_id", "lang", Map("en" -> 30), 100)
      .select("doc_id", "bucket", "kept").as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val s2 = Corpus.hashSample(docs, "doc_id", "lang", Map("en" -> 30), 100)
      .select("doc_id", "bucket", "kept").as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(s1.toSeq == s2.toSeq)
    s1.foreach { case (id, bucket, kept) =>
      val rate = if (id % 2 == 0) 30 else 100
      assert(kept == (bucket < rate))
    }
    // the en stratum is actually downsampled; zh is fully kept
    assert(s1.filter(_._1 % 2 == 0).count(_._3) < 100)
    assert(s1.filter(_._1 % 2 == 1).forall(_._3))
  }

  test("packSequences packs per shard with contiguous offsets and bin spans") {
    val docs = Seq(
      (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L), // shard a: 1800 tokens
      (10L, "b", 100L)).toDF("doc_id", "shard_col", "n")
    val packed = Corpus.packSequences(docs, "doc_id", "shard_col", col("n"), budget = 1024L)
      .select("id", "shard", "tok_start", "bin_first", "bin_last")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: [0, 600) -> bin 0; doc 2: [600, 1200) straddles bins 0-1;
    // doc 3: [1200, 1800) -> bin 1; shard b packs independently from 0.
    assert(packed == Seq(
      (1L, "a", 0L, 0L, 0L),
      (2L, "a", 600L, 0L, 1L),
      (3L, "a", 1200L, 1L, 1L),
      (10L, "b", 0L, 0L, 0L)))
  }

  test("packSequences stays integer-exact past 2^53 cumulative tokens") {
    // (2^53 + 1) is not representable as a double: a '/'-based bin compute
    // would round it and misplace the second doc's bins.
    val big = (1L << 53) + 1L
    val docs = Seq((1L, "a", big), (2L, "a", 3L)).toDF("doc_id", "shard_col", "n")
    val packed = Corpus.packSequences(docs, "doc_id", "shard_col", col("n"), budget = 2L)
      .select("id", "tok_start", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(packed == Seq(
      (1L, 0L, 0L, (big - 1) / 2),
      (2L, big, big / 2, (big + 2) / 2)))
  }

  test("heavyHitters ranks the planted skew first and respects k") {
    val docs = Seq(
      ("en", "zzz zzz zzz zzz aaa bbb"),
      ("en", "zzz zzz ccc ddd eee fff")).toDF("lang", "text")
    val top = Corpus.heavyHitters(docs, "lang", "text", k = 3)
      .select("stratum", "token", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().sortBy(_._4).toSeq
    assert(top.size == 3)
    assert(top.head == (("en", "zzz", 6L, 1)))
    assert(top(1)._3 == 1L) // ties at cnt=1 break alphabetically
    assert(top(1)._2 == "aaa" && top(2)._2 == "bbb")
  }

  test("heavyHitters salted two-phase top-k == single-window ranking (the 100 TB path)") {
    // the salted plan must be BIT-IDENTICAL to salts=1 (one global window):
    // any global top-k token is top-k within its own salt, so phase 1
    // loses no candidate — including under heavy cnt ties, where the
    // token-asc tiebreak decides membership
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang"), col("text"))
    def run(salts: Int) = Corpus.heavyHitters(docs, "lang", "text", k = 10,
        salts = salts)
      .select("stratum", "token", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    assert(run(32) == run(1))
    assert(run(7) == run(1)) // salt count must not matter
  }

  test("leakageSafeSplit: same group -> same split, always; weights validated") {
    val docs = Seq(
      (1L, "gA"), (2L, "gA"), (3L, "gA"),     // a dup cluster
      (4L, "gB"), (5L, "gC"), (6L, "gB"))
      .toDF("doc_id", "grp")
    val out = Corpus.leakageSafeSplit(docs, "grp",
        Seq("train" -> 8000, "val" -> 1000, "test" -> 1000), seed = "s")
      .select("doc_id", "grp", "split")
      .as[(Long, String, String)].collect().toSeq
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byGroup.forall(_._2.size == 1),
      s"a group straddled splits: $out")
    // derandomized: a re-run assigns identically
    val again = Corpus.leakageSafeSplit(docs, "grp",
        Seq("train" -> 8000, "val" -> 1000, "test" -> 1000), seed = "s")
      .select("doc_id", "split").as[(Long, String)].collect().toSeq
    assert(again.sorted == out.map(t => (t._1, t._3)).sorted)
    // weights must be basis points summing to 10000
    intercept[IllegalArgumentException](Corpus.leakageSafeSplit(docs, "grp",
      Seq("train" -> 9000, "val" -> 500), seed = "s"))
  }

  test("leakageSafeSplit honors weights across many groups") {
    val docs = (0 until 5000).map(i => (i.toLong, s"group$i")).toDF("doc_id", "grp")
    val frac = Corpus.leakageSafeSplit(docs, "grp",
        Seq("train" -> 8000, "val" -> 1000, "test" -> 1000), seed = "w")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(frac("train") - 4000) < 200, s"train share off: $frac")
    assert(math.abs(frac("val") - 500) < 120 && math.abs(frac("test") - 500) < 120,
      s"val/test share off: $frac")
  }

  test("piiScrub masks emails, IPs and phone runs with exact counts") {
    val df = Seq(
      (1L, "mail bob@corp.example.org then ip 192.168.2.44 tel 555-0199 done"),
      (2L, "nothing sensitive here")).toDF("id", "t")
    val out = Corpus.piiScrub(df, "t")
      .select("id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out(0)._5 == "mail <EMAIL> then ip <IP> tel <PHONE> done")
    assert((out(0)._2, out(0)._3, out(0)._4) == ((1L, 1L, 1L)))
    assert(out(1) == ((2L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("urlNormalize lowercases host, strips ports/www/fragments/utm params") {
    val df = Seq(
      (1L, "HTTPS://WWW.News.Example.COM:443/World/Story?utm_source=x&id=9#top"),
      (2L, "http://blog.other.org:80/post?a=1&utm_campaign=c&b=2"),
      (3L, "https://plain.net/path"),
      // NON-default ports: http on 443 / https on 8080 are real ports and
      // must survive normalization (distinct URLs stay distinct).
      (4L, "http://cdn.example.net:443/a"),
      (5L, "HTTPS://api.Example.net:8080/b")).toDF("id", "url")
    val out = Corpus.urlNormalize(df, "url")
      .select("id", "norm_url", "domain")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, "https://news.example.com/World/Story?id=9", "example.com")))
    assert(out(1) == ((2L, "http://blog.other.org/post?a=1&b=2", "other.org")))
    assert(out(2) == ((3L, "https://plain.net/path", "plain.net")))
    assert(out(3) == ((4L, "http://cdn.example.net:443/a", "example.net")))
    assert(out(4) == ((5L, "https://api.example.net:8080/b", "example.net")))
  }

  test("bloomDecontaminate returns exactly the exact semi-join result") {
    val overlap = "one two three four five six"
    val train = Seq(
      (1L, s"alpha beta $overlap gamma delta"),
      (2L, "epsilon zeta eta theta iota kappa lambda"),
      (3L, s"mu nu $overlap xi omicron")).toDF("doc_id", "text")
    val eval_ = Seq((100L, s"prefix words $overlap suffix words")).toDF("doc_id", "text")
    val exact = Corpus.decontaminate(train, eval_, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toSet
    val bloom = Corpus.bloomDecontaminate(train, eval_, "doc_id", "text", n = 4,
      expectedEvalNgrams = 1024L)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // planted overlap actually fires
    assert(bloom == exact)
  }

  test("bloomDecontaminate with an empty eval side returns empty, not a crash") {
    val train = Seq((1L, "some training words here")).toDF("doc_id", "text")
    val eval_ = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Corpus.bloomDecontaminate(train, eval_, "doc_id", "text", n = 4,
      expectedEvalNgrams = 64L).count() == 0)
  }

  test("shuffleShards is deterministic with dense per-shard sequences") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def run() = Corpus.shuffleShards(docs, "doc_id", numShards = 4, seed = "s1")
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect().toSet
    val a = run(); val b = run()
    assert(a == b) // pure-hash: no RNG state, rerun-stable
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // seq is 1..n within each shard, no gaps or dups
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size))
    }
    // a different seed reshuffles
    val c = Corpus.shuffleShards(docs, "doc_id", numShards = 4, seed = "s2")
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect().toSet
    assert(c != a)
  }

  test("profile computes exact interpolated percentiles per stratum") {
    // en: token counts 1,2,3,4 -> p50 = 2.5 (interpolated), p90 = 3.7
    val docs = Seq(
      ("en", "a"), ("en", "a b"), ("en", "a b c"), ("en", "a b c d"),
      ("de", "x y z")).toDF("lang", "text")
    val p = Corpus.profile(docs, "lang", "text")
      .select("stratum", "n_docs", "sum_tokens", "min_tokens", "max_tokens", "p50", "p90")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("en")._2 == 4L && p("en")._3 == 10L && p("en")._4 == 1L && p("en")._5 == 4L)
    assert(math.abs(p("en")._6 - 2.5) < 1e-9)
    assert(math.abs(p("en")._7 - 3.7) < 1e-9)
    assert(p("de")._2 == 1L && math.abs(p("de")._6 - 3.0) < 1e-9)
  }

  test("cmsHeavyTokens equals the exact threshold count") {
    // 'hot' appears 12x (heavy at threshold 10), 'warm' 8x, tail 1x each
    val docs = Seq(
      (1L, ("hot " * 6 + "warm " * 4 + "a b c").trim),
      (2L, ("hot " * 6 + "warm " * 4 + "d e f").trim)).toDF("doc_id", "text")
    val cms = Corpus.cmsHeavyTokens(docs, "text", threshold = 10L)
      .as[(String, Long)].collect().toSet
    assert(cms == Set(("hot", 12L)))
    // lower threshold admits warm too — exact counts, not estimates
    val cms2 = Corpus.cmsHeavyTokens(docs, "text", threshold = 8L)
      .as[(String, Long)].collect().toSet
    assert(cms2 == Set(("hot", 12L), ("warm", 8L)))
  }

  test("domainCap keeps the first `cap` docs per domain in id order") {
    val df = Seq.tabulate(8)(i => (i.toLong, s"https://big.com/p$i")) ++
      Seq((100L, "https://small.org/x"))
    val out = Corpus.domainCap(
      Corpus.urlNormalize(df.toDF("id", "url"), "url"), "id", cap = 3)
      .select("id", "rank", "kept")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.filter(_._3).map(_._1) == Seq(0L, 1L, 2L, 100L))
    assert(out.find(_._1 == 7L).get._2 == 8)
  }

  test("temperatureMix upweights rare strata and respects the target shape") {
    // 90 majority + 10 minority docs, target 50: α=0.5 keeps the minority
    // at a HIGHER rate than the majority (the whole point of temperature
    // sampling), and rates are exact basis points from the count table.
    val df = (Seq.tabulate(90)(i => (i.toLong, "big")) ++
      Seq.tabulate(10)(i => (100L + i, "rare"))).toDF("id", "s")
    val out = Corpus.temperatureMix(df, "id", "s", targetTotal = 50)
      .select("s", "rate_bp").distinct().as[(String, Long)].collect().toMap
    val sumSqrt = math.sqrt(90.0) + math.sqrt(10.0)
    assert(out("big") ==
      math.floor(math.min(1.0, 50.0 * (math.sqrt(90.0) / sumSqrt) / 90.0) * 10000.0).toLong)
    assert(out("rare") ==
      math.floor(math.min(1.0, 50.0 * (math.sqrt(10.0) / sumSqrt) / 10.0) * 10000.0).toLong)
    assert(out("rare") > out("big"), "rare stratum keeps a higher fraction")
  }

  test("temperatureMix caps rates at 100% and is deterministic") {
    // tiny stratum whose fair share exceeds its size -> rate capped at 1.0
    val df = (Seq.tabulate(99)(i => (i.toLong, "big")) ++ Seq((200L, "one")))
      .toDF("id", "s")
    val out = Corpus.temperatureMix(df, "id", "s", targetTotal = 90)
      .select("s", "rate_bp", "kept")
    val rates = out.select("s", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("one") == 10000L, "over-demanded stratum capped at 100%")
    val k1 = out.filter($"kept").count()
    val k2 = Corpus.temperatureMix(df, "id", "s", targetTotal = 90)
      .filter($"kept").count()
    assert(k1 == k2)
  }

  test("temperatureMix kept volume lands near the target (md5 buckets are fair)") {
    // 3 strata x 2000 rows, target 3000: expected kept = sum n_i*rate_i/1e4;
    // md5 buckets are uniform enough that the realized count sits within a
    // few percent of the rate-implied expectation (exact value is pinned by
    // the t27 oracle; this pins the STATISTICAL contract on fresh data)
    val df = (0 until 6000).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "s")
    val out = Corpus.temperatureMix(df, "id", "s", targetTotal = 3000)
    val rates = out.select("s", "rate_bp").distinct().as[(String, Long)].collect().toMap
    val expected = rates.values.map(r => 2000.0 * r / 10000.0).sum
    val kept = out.filter($"kept").count()
    assert(math.abs(kept - expected) / expected < 0.05,
      s"kept $kept vs rate-implied $expected")
    // uniform strata at alpha=0.5 -> equal rates -> kept ~ target
    assert(math.abs(kept - 3000) < 300)
  }

  test("lmCrossEntropy: formulaic text scores lower than novel text; short docs null") {
    // five copies of a template make its bigrams high-probability under the
    // corpus-trained model; the all-unique doc's bigrams are all unseen-ish
    // singletons — the CCNet cut keeps the low-xent head
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (Seq.tabulate(5)(i => (i.toLong, common)) ++
      Seq((100L, "zxq wvu tsr qpo nml kji hgf edc ba"), (200L, "solo")))
      .toDF("doc_id", "text")
    val out = Corpus.lmCrossEntropy(docs, "doc_id", "text")
      .select("id", "n_bigrams", "xent")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L)._1 == 11L)
    assert(out(0L)._2.get < out(100L)._2.get,
      "repeated phrasing must score lower cross-entropy than novel text")
    assert(out(200L) == ((0L, None)), "a bigram-less doc scores null, not 0")
    // identical docs score identically (model is corpus-global)
    assert(out(1L) == out(0L))
  }

  test("kneserNeyXent: hand-computed probabilities and the sum-to-one property") {
    // d1 = "a b a b": bigrams ab, ba, ab; d2 = "a c": ac.
    // c(ab)=2 c(ba)=1 c(ac)=1; fw: a→(c1=3,n1fw=2), b→(1,1);
    // bw: n1bw(a)=n1bw(b)=n1bw(c)=1; B=3; D=0.75.
    //  P(b|a) = 1.25/3 + (1.5/3)(1/3) = 0.58333…
    //  P(a|b) = 0.25   + 0.75·(1/3)   = 0.5
    //  P(c|a) = 0.25/3 + (1.5/3)(1/3) = 0.25
    //  d1 xent = −(2·ln P(b|a) + ln P(a|b))/3;  d2 xent = −ln P(c|a)
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Corpus.kneserNeyXent(docs, "doc_id", "text")
      .select("id", "n_bigrams", "xent")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val pba = 1.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val pab = 0.25 + 0.75 * (1.0 / 3)
    val pca = 0.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2.get - (-(2 * math.log(pba) + math.log(pab)) / 3)) < 1e-9)
    assert(math.abs(out(2L)._2.get - (-math.log(pca))) < 1e-9)
    assert(out(3L) == ((0L, None)), "bigram-less doc scores null")
    // KN is a proper distribution: over context 'a', seen-continuation
    // discounted mass + redistributed continuation mass totals exactly 1
    // (Σ_w2 P(w2|a) over the vocab = (c1 − D·n1fw)/c1 + (D·n1fw/c1)·(Σ n1bw/B))
    assert(math.abs((pba + pca +
      (0.75 * 2 / 3) * (1.0 / 3) /* P(a|a): unseen, pure continuation */) - 1.0) < 1e-12)
    // the unseen-bigram pure-continuation path: P(a|a) has c12=0 — the
    // engine never scores it with train==score, but the formula's
    // discount branch (greatest(c12−D, 0) = 0) is what the sum above pins
  }

  test("dsirResample weights target-like raw docs above off-target ones") {
    // target slice = medical-ish phrasing; raw corpus has one doc in the
    // target register and one far from it — the importance log-weight must
    // separate them regardless of the Gumbel perturbation (whose spread is
    // a few nats; the planted gap is much larger)
    val medical = "patient dose trial clinical outcome patient dose trial"
    val docs = Seq(
      (0L, medical), (23L, medical), (46L, medical),        // targets (% 23)
      (1L, "patient dose trial clinical outcome measured"), // target-like raw
      (2L, "guitar amplifier pedal reverb tone wood luthier"), // off-target raw
      (3L, "")                                              // gram-less raw
    ).toDF("doc_id", "text")
    val out = Corpus.dsirResample(docs, "doc_id", "text",
        col("doc_id") % 23 === 0, buckets = 4096, k = 2, seed = "t")
      .select("id", "n_grams", "logw", "selected", "rank")
      .as[(Long, Long, Double, Boolean, Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "only raw docs are scored")
    assert(out(1L)._3 > out(2L)._3 + 5.0,
      "target-register doc must out-weigh the off-target doc decisively")
    assert(out(3L)._3 == 0.0 && out(3L)._2 == 0L,
      "gram-less doc gets the neutral weight")
    assert(out.values.count(_._4) == 2, "exactly k selected")
    assert(out.values.filter(_._4).flatMap(_._5).toSet == Set(1, 2),
      "selected rows carry dense ranks 1..k; unselected rank is null")
    assert(out.values.filterNot(_._4).forall(_._5.isEmpty))
    // derandomized: a re-run replays the identical sample
    val again = Corpus.dsirResample(docs, "doc_id", "text",
        col("doc_id") % 23 === 0, buckets = 4096, k = 2, seed = "t")
      .select("id", "n_grams", "logw", "selected", "rank")
      .as[(Long, Long, Double, Boolean, Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("temperatureMix drops null-stratum rows and accepts non-string strata") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "s")
    val out = Corpus.temperatureMix(df, "id", "s", targetTotal = 2)
      .select("id", "rate_bp", "kept").as[(Long, Long, Boolean)].collect()
    assert(out.find(_._1 == 3L).get._2 == 0L, "null stratum gets rate 0")
    assert(!out.find(_._1 == 3L).get._3)
    // integer strata mix by their string form instead of ClassCastException
    val ints = Seq((1L, 7), (2L, 7), (3L, 8)).toDF("id", "s")
    val rates = Corpus.temperatureMix(ints, "id", "s", targetTotal = 2)
      .select("s", "rate_bp").distinct().collect()
    assert(rates.length == 2 && rates.forall(_.getLong(1) > 0))
  }

  test("quotaSample: exact quotas, bit-identical across salt counts") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    def run(salts: Int) = graft.operators.Corpus
      .quotaSample(df, "id", "g", k = 20, seed = "s", salts = salts)
      .select("id", "g", "rank").as[(Long, String, Int)].collect().toSet
    val base = run(1)
    assert(base == run(7) && base == run(32), "salting changed the selection")
    assert(base.count(_._2 == "a") == 20 && base.count(_._2 == "b") == 20)
    // small stratum: quota caps at its size
    val tiny = (1 to 5).map(i => (i.toLong, "x")).toDF("id", "g")
    assert(graft.operators.Corpus.quotaSample(tiny, "id", "g", 20, "s")
      .count() == 5)
  }

  test("packFfd: budget respected, oversize isolated, beats-or-ties naive packing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(37)
    val items = (1 to 200).map(i =>
      (i.toLong, "s" + (i % 3), 50L + rnd.nextInt(700))) :+
      ((201L, "s0", 5000L)) // oversize: must sit alone
    val df = items.toDF("id", "shard", "len")
    val out = graft.operators.Corpus.packFfd(df, "id", "shard", col("len"), 1024L)
      .select("shard", "id", "len", "bin").as[(String, Long, Long, Long)]
      .collect().toSeq
    val byBin = out.groupBy(r => (r._1, r._4))
    // every non-oversize bin within budget; the oversize item alone
    byBin.foreach { case ((_, _), rows) =>
      if (rows.exists(_._3 > 1024L)) assert(rows.size == 1, "oversize not isolated")
      else assert(rows.map(_._3).sum <= 1024L, s"bin overflow: $rows")
    }
    // utilization: FFD bins <= naive sequential bins per shard
    items.groupBy(_._2).foreach { case (sh, its) =>
      val ffdBins = out.filter(_._1 == sh).map(_._4).distinct.size
      var load = 0L; var naive = 1
      its.sortBy(_._1).foreach { case (_, _, l) =>
        if (load + l > 1024L) { naive += 1; load = l } else load += l }
      assert(ffdBins <= naive, s"$sh: ffd $ffdBins > naive $naive")
    }
  }

  test("fimTransform: segments reassemble the original; conservation; rate honored") {
    val docs = (0L until 200L).map(i => (i, s"doc $i body " + ("x" * (i % 37).toInt)))
      .toDF("doc_id", "text")
    val out = graft.operators.Corpus.fimTransform(docs, "doc_id", "text")
      .select("doc_id", "text", "is_fim", "n_prefix", "n_middle", "n_suffix", "fim_text")
      .collect()
    out.foreach { r =>
      val (text, fim) = (r.getString(1), r.getString(6))
      val (np, nm, ns) = (r.getLong(3).toInt, r.getLong(4).toInt, r.getLong(5).toInt)
      assert(np + nm + ns == text.length, s"conservation broke on ${r.getLong(0)}")
      if (r.getBoolean(2)) {
        // <PRE>prefix<SUF>suffix<MID>middle reassembles prefix+middle+suffix
        assert(fim.startsWith("<PRE>"))
        val afterPre = fim.drop(5)
        val prefix = afterPre.take(np)
        assert(afterPre.slice(np, np + 5) == "<SUF>")
        val suffix = afterPre.slice(np + 5, np + 5 + ns)
        assert(afterPre.slice(np + 5 + ns, np + 10 + ns) == "<MID>")
        val middle = afterPre.drop(np + 10 + ns)
        assert(middle.length == nm)
        assert(prefix + middle + suffix == text, s"reassembly broke on ${r.getLong(0)}")
      } else {
        assert(fim == text, "non-FIM doc must pass through verbatim")
      }
    }
    val rate = out.count(_.getBoolean(2)).toDouble / out.length
    assert(rate > 0.8 && rate < 0.97, s"fim rate $rate far from 0.9")
    // rate 0 disables the transform entirely
    val off = graft.operators.Corpus.fimTransform(docs, "doc_id", "text", rateBp = 0)
      .filter(org.apache.spark.sql.functions.col("is_fim")).count()
    assert(off == 0L)
  }

  test("spanCorrupt: T5 example format at the rate extremes + structural laws") {
    val one = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // rate 0: identity input, lone-terminator target
    val off = graft.operators.Corpus.spanCorrupt(one, "doc_id", "text", noiseBp = 0)
      .select("n_masked", "n_spans", "input_text", "target_text").head()
    assert(off.getLong(0) == 0 && off.getLong(1) == 0)
    assert(off.getString(2) == "alpha beta gamma delta epsilon zeta eta theta")
    assert(off.getString(3) == "<extra_id_0>")
    // rate 10000: one all-covering span, the exact T5 target format
    val full = graft.operators.Corpus.spanCorrupt(one, "doc_id", "text", noiseBp = 10000)
      .select("n_masked", "n_spans", "input_text", "target_text").head()
    assert(full.getLong(0) == 8 && full.getLong(1) == 1)
    assert(full.getString(2) == "<extra_id_0>")
    assert(full.getString(3) ==
      "<extra_id_0> alpha beta gamma delta epsilon zeta eta theta <extra_id_1>")
    // default rate over a corpus: sentinels are contiguous-increasing in
    // the input, and target length = n_masked + n_spans + 1 tokens
    val docs = (0L until 50L)
      .map(i => (i, (0 until 40).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.Corpus.spanCorrupt(docs, "doc_id", "text")
      .select("n_masked", "n_spans", "input_text", "target_text").collect()
    val sentinelRe = "<extra_id_(\\d+)>".r
    out.foreach { r =>
      val (nm, nsp) = (r.getLong(0), r.getLong(1))
      val ids = sentinelRe.findAllMatchIn(r.getString(2)).map(_.group(1).toInt).toSeq
      assert(ids == (0 until nsp.toInt), s"input sentinels not 0..${nsp - 1}: $ids")
      assert(r.getString(3).split(" ").length == nm + nsp + 1,
        "target must hold every masked token + one sentinel per span + terminator")
    }
    assert(out.map(_.getLong(0)).sum > 0, "default rate must mask something")
  }

  test("gopherQuality: every rule fires in the stated precedence; exact tallies") {
    val w18 = (1 to 18).map(_ => "word").mkString(" ")
    val w12 = (1 to 12).map(_ => "word").mkString(" ")
    val docs = Seq(
      (0L, s"$w18 the and"),                                   // clean
      (1L, "the and word"),                                    // word_count
      (2L, (1 to 20).map(_ => "ab").mkString(" ") + " the and"), // mean_word_len (46 chars / 22 words < 3)
      (3L, s"$w18 the and # # #"),                             // symbol_ratio (3*10 > 23+2? no: 25 words... see below)
      (4L, s"•$w12\n•$w12"),                         // bullet_lines (2/2)
      (5L, s"$w12...\n$w12..."),                               // ellipsis_lines (2/2)
      (6L, w12 + " " + (1 to 12).map(_ => "42").mkString(" ")), // alpha_words (12/24 < 80%)
      (7L, (1 to 24).map(_ => "word").mkString(" "))           // stopwords (0 < 2)
    ).toDF("doc_id", "text")
    val out = Corpus.gopherQuality(docs, "doc_id", "text", minWords = 20L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val reasons = (0L to 7L).map(i => out(i).getAs[String]("reason"))
    assert(reasons == Seq("clean", "word_count", "mean_word_len",
      "symbol_ratio", "bullet_lines", "ellipsis_lines", "alpha_words",
      "stopwords"), s"got $reasons")
    // exact tallies on the clean doc: 20 words of 18*4+3+3 chars, 1 line
    val c = out(0L)
    assert(c.getAs[Long]("n_words") == 20L)
    assert(c.getAs[Long]("sum_word_chars") == 78L)
    assert(c.getAs[Long]("n_symbols") == 0L)
    assert(c.getAs[Long]("n_alpha_words") == 20L)
    assert(c.getAs[Long]("n_stopwords") == 2L)
    assert(c.getAs[Long]("n_lines") == 1L)
    assert(c.getAs[Boolean]("keep"))
    // the ellipsis doc's '...' also tallies as symbols but passes the
    // symbol rule (2*10 <= 26 words... ) — attribution lands on ellipsis
    assert(out(5L).getAs[Long]("n_symbols") == 2L)
    // paper default floor: a 30-word doc fails word_count at minWords=50
    val thirty = Seq((9L, (1 to 28).map(_ => "word").mkString(" ") + " the and"))
      .toDF("doc_id", "text")
    assert(Corpus.gopherQuality(thirty, "doc_id", "text")
      .head().getAs[String]("reason") == "word_count")
  }

  test("c4LineFilters: line-rule attribution, page verdicts, cleaned text") {
    val k = "alpha beta gamma delta epsilon."
    val docs = Seq(
      (0L, s"$k\n$k\n$k"),                                     // kept
      (1L, s"$k\nno terminal punct line here\n$k\n$k"),        // kept, 1 no-punct
      (2L, s"$k\ntiny line.\n$k\n$k"),                         // kept, 1 short
      (3L, s"$k\nthis line mentions javascript today ok.\n$k\n$k"), // kept, 1 js
      (4L, s"$k\n$k"),                                         // too_few_sentences
      (5L, s"$k\n$k\n$k\nlorem ipsum dolor."),                 // lorem_ipsum
      (6L, s"$k\n$k\n$k\nx = { }.")                            // brace
    ).toDF("doc_id", "text")
    val out = Corpus.c4LineFilters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((0L to 6L).map(i => out(i).getAs[String]("reason")) ==
      Seq("kept", "kept", "kept", "kept", "too_few_sentences",
        "lorem_ipsum", "brace"))
    assert(out(1L).getAs[Long]("n_no_punct") == 1L &&
      out(1L).getAs[Long]("n_kept") == 3L)
    assert(out(2L).getAs[Long]("n_short") == 1L)
    assert(out(3L).getAs[Long]("n_js") == 1L)
    // every dropped line attributed to exactly one rule
    (0L to 6L).foreach { i =>
      val r = out(i)
      assert(r.getAs[Long]("n_no_punct") + r.getAs[Long]("n_short") +
        r.getAs[Long]("n_js") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_lines"), s"attribution gap on doc $i")
    }
    assert(out(1L).getAs[String]("cleaned") == s"$k\n$k\n$k")
    assert(!out(4L).getAs[Boolean]("keep"))
  }

  test("nbClassifier: planted separable vocab classifies perfectly; exact score") {
    // 3 classes with disjoint vocabularies; ids 0..59 → seed slice
    // (id%10==0) holds exactly 2 docs of each class
    val vocabByCls = Seq("alpha", "beta", "gamma")
    val docs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, s"c$c", (1 to 10).map(_ => vocabByCls(c)).mkString(" "))
    }.toDF("doc_id", "label", "text")
    val rows = Corpus.nbClassifier(docs, "doc_id", "text", "label").collect()
    assert(rows.length == 54, "6 seed docs must be excluded from scoring")
    assert(rows.forall(_.getAs[Boolean]("correct")), "separable vocab must classify 100%")
    // hand-computed score for doc 3 (class c0, 10× alpha): seed has
    // cnt(alpha,c0)=20, tot_c0=20, V=3, prior 2/6 →
    // score = ln(2/6) + 10·ln(21/23), emitted as floor(·1e6)
    val expected = math.floor(
      (math.log(2.0 / 6.0) + 10 * math.log(21.0 / 23.0)) * 1000000.0).toLong
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Long]("score_fp") == expected,
      s"got ${r3.getAs[Long]("score_fp")}, want $expected")
    assert(r3.getAs[Long]("n_tokens") == 10L)
  }

  test("linearClassifier: planted separable vocab classifies perfectly; " +
    "exact integer score, margin, and centroid replay") {
    // same split fixture as nbClassifier: 3 classes, disjoint vocab,
    // ids 0..59, seed slice = 2 docs/class. A 10-word doc has 19 grams
    // (10 unigrams + 9 'w w' bigrams); the 6 distinct grams land in 6
    // DISTINCT md5 buckets (precomputed: 251/235/123/108/41/18 of 256),
    // so cross-class dot products are exactly 0 and the in-class score
    // is w_uni^2 + w_bi^2 with w = (cnt*1e6) div 19 — every step exact.
    val vocabByCls = Seq("alpha", "beta", "gamma")
    val docs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      (i, s"c$c", (1 to 10).map(_ => vocabByCls(c)).mkString(" "))
    }.toDF("doc_id", "label", "text")
    val rows = Corpus.linearClassifier(docs, "doc_id", "text", "label")
      .collect()
    assert(rows.length == 54, "6 seed docs must be excluded from scoring")
    assert(rows.forall(_.getAs[Boolean]("correct")),
      "separable vocab must classify 100%")
    val wUni = 10L * 1000000L / 19L  // 526315
    val wBi = 9L * 1000000L / 19L    // 473684
    val expected = wUni * wUni + wBi * wBi  // 501384011081
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Long]("score") == expected,
      s"got ${r3.getAs[Long]("score")}, want $expected")
    assert(r3.getAs[Long]("margin") == expected,
      "wrong classes score exactly 0, so margin == score")
    assert(r3.getAs[Long]("n_grams") == 19L)
    // fixture premise check: the 6 grams really do hash to distinct
    // buckets under the operator's md5 rule
    def bucket(g: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16) % 256
    val bks = Seq("alpha", "beta", "gamma",
      "alpha alpha", "beta beta", "gamma gamma").map(bucket)
    assert(bks.distinct.size == 6, s"fixture premise: $bks")
    // single-token doc: no bigrams, 1 gram; OOV text scores 0 for every
    // class -> deterministic label-asc argmax with margin 0
    val oov = Corpus.linearClassifier(
      (0L until 60L).map { i =>
        (i, s"c${i % 3}", if (i == 3L) "zzz" else "alpha")
      }.toDF("doc_id", "label", "text"), "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(oov(3L).getAs[String]("pred") == "c0" &&
      oov(3L).getAs[Long]("score") == 0L &&
      oov(3L).getAs[Long]("margin") == 0L,
      s"OOV doc: all-zero scores, label-asc tie-break: ${oov(3L)}")
    assert(oov(4L).getAs[Long]("n_grams") == 1L,
      "single-token doc has one gram (no bigrams)")
    val e = intercept[IllegalArgumentException] {
      Corpus.linearClassifier(docs, "doc_id", "text", "label",
        buckets = 100000)
    }
    assert(e.getMessage.contains("buckets"))
    // zero trained classes must raise (empty MODEL, not empty corpus):
    // all ids odd -> the id % 2 == 0 seed slice is empty
    val oddDocs = Seq((1L, "c0", "alpha"), (3L, "c1", "beta"))
      .toDF("doc_id", "label", "text")
    val e2 = intercept[Exception] {
      Corpus.linearClassifier(oddDocs, "doc_id", "text", "label",
        seedMod = 2).collect()
    }
    assert(e2.getMessage.contains("zero classes"), s"got: ${e2.getMessage}")
  }

  test("sftRender: exact ChatML bytes and hand-computed mask bounds") {
    val docs = Seq((1L, "hello there", "hi", "bye", "see you later"))
      .toDF("doc_id", "u1", "a1", "u2", "a2")
    val rows = Corpus.sftRender(docs, "doc_id",
      Seq(("u1", "a1"), ("u2", "a2"))).orderBy("turn").collect()
    assert(rows.length == 2)
    val expected =
      "<|im_start|>system\nyou are a helpful assistant\n<|im_end|>" +
        "\n<|im_start|>user\nhello there\n<|im_end|>" +
        "\n<|im_start|>assistant\nhi\n<|im_end|>" +
        "\n<|im_start|>user\nbye\n<|im_end|>" +
        "\n<|im_start|>assistant\nsee you later\n<|im_end|>"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.forall(_.getAs[String]("sft_md5") == md),
      "rendered bytes must match the hand-built ChatML string")
    // whitespace tokens: sys 7 | user 4 | asst 3 | user 3 | asst 5 = 22
    assert(rows.forall(_.getAs[Long]("n_tokens") == 22L))
    // turn 1: assistant marker at 11 → mask covers 'hi' + close = [12,13]
    assert(rows(0).getAs[Long]("mask_start") == 12L &&
      rows(0).getAs[Long]("mask_end") == 13L)
    // turn 2: marker at 17 → mask covers 'see you later' + close = [18,21]
    assert(rows(1).getAs[Long]("mask_start") == 18L &&
      rows(1).getAs[Long]("mask_end") == 21L)
    // the mask really lands on assistant tokens in the rendered stream
    val toks = expected.split("\\s+")
    assert(toks(12) == "hi" && toks(13) == "<|im_end|>")
    assert(toks.slice(18, 21).mkString(" ") == "see you later" &&
      toks(21) == "<|im_end|>")
  }

  test("dpoPairs: QC gates in stated precedence; winner orders the pair") {
    val docs = Seq(
      (1L, "Prompt One", "good answer here", "bad answer text", true),
      (2L, "prompt two", "good answer here", "bad answer text", false),
      (3L, "prompt one", "another a", "another b", true), // dup of 1 (case-insensitive fp)
      (4L, "prompt x", "a", "long answer here", true),
      (5L, "prompt y", "same words here", "same words here", true),
      (6L, "prompt z", "two words", "one two three four five", true)
    ).toDF("doc_id", "p", "ra", "rb", "win_a")
    val out = Corpus.dpoPairs(docs, "doc_id", "p", "ra", "rb", "win_a")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((1L to 6L).map(i => out(i).getAs[String]("reason")) ==
      Seq("kept", "kept", "dup_prompt", "too_short", "identical",
        "length_ratio"))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // win_a=true → chosen=ra; the RAW prompt feeds the pair bytes
    assert(out(1L).getAs[String]("pair_md5") ==
      md5hex("Prompt Onegood answer herebad answer text"))
    // win_a=false → responses swap
    assert(out(2L).getAs[String]("pair_md5") ==
      md5hex("prompt twobad answer textgood answer here"))
    assert(out(4L).getAs[String]("pair_md5") == null)
  }

  test("contaminationReport: exact per-eval-doc basis points and verdicts") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // full dup: 3/3 shingles
      (11L, "totally different words here now"),    // disjoint: 0/2
      (12L, "alpha beta gamma delta new words here also"), // 1/5 shared
      (13L, "tiny doc")                             // shingle-less: zeros
    ).toDF("doc_id", "text")
    val out = Corpus.contaminationReport(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[Long]("contamination_bp") == 10000L &&
      out(10L).getAs[String]("verdict") == "contaminated")
    assert(out(11L).getAs[Long]("n_shared") == 0L &&
      out(11L).getAs[String]("verdict") == "clean")
    assert(out(12L).getAs[Long]("n_shingles") == 5L &&
      out(12L).getAs[Long]("n_shared") == 1L &&
      out(12L).getAs[Long]("contamination_bp") == 2000L &&
      out(12L).getAs[String]("verdict") == "suspect")
    assert(out(13L).getAs[Long]("n_shingles") == 0L &&
      out(13L).getAs[Long]("contamination_bp") == 0L &&
      out(13L).getAs[String]("verdict") == "clean",
      "shingle-less eval docs report zeros, never drop")
  }

  test("canaryExposure: xent falls with insertions, planted outrank decoys, " +
    "decoys tie on id, and candidates are never trained on") {
    val train = Seq(
      (1L, "base words here ca cb"),         // canary A inserted twice,
      (2L, "more base words ca cb"),         // canary B once
      (3L, "other filler text cc cd")
    ).toDF("doc_id", "text")
    val cands = Seq(
      (0L, "ca cb"),   // 2 insertions
      (1L, "cc cd"),   // 1 insertion
      (2L, "dx dy"),   // decoy
      (3L, "dz dw")    // decoy (identical physics -> tie on id)
    ).toDF("cand_id", "ctext")
    val out = Corpus.canaryExposure(train, cands, "text", "cand_id", "ctext")
      .select("cand_id", "n_bigrams", "xent", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // hand arithmetic: V = 11 distinct train tokens (base words here ca
    // cb more other filler text cc cd); add-one bigram LM
    // p(cb|ca) = (2+1)/(2+11); p(cd|cc) = (1+1)/(1+11); decoy = 1/(0+11)
    assert(math.abs(out(0L)._2 - (-math.log(3.0 / 13))) < 5e-5)
    assert(math.abs(out(1L)._2 - (-math.log(2.0 / 12))) < 5e-5)
    assert(out(0L)._3 == 1L && out(1L)._3 == 2L,
      "more insertions -> lower xent -> better rank")
    assert(out(2L)._3 == 3L && out(3L)._3 == 4L,
      "identical decoys tie-break on candidate id")
    assert(out(2L)._2 == out(3L)._2, "decoy xents identical")
    // methodology: scoring must not train on candidates - the decoy
    // bigram is UNSEEN (add-one floor 1/(0+V)), which only holds if the
    // candidate rows never entered the count tables
    assert(math.abs(out(2L)._2 - (-math.log(1.0 / 11))) < 5e-5)
  }

  test("memorizationReport: planted copy lengths bound max_matched_rung exactly") {
    // train = one 16-token doc; eval plants a full copy (matches through
    // rung 16, honestly has zero 32-grams), a 5-token run (rung 4 only),
    // and a disjoint doc (all zeros)
    val train = Seq((1L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "a b c d e f g h i j k l m n o p"),
      (101L, "a b c d e x1 x2 x3 x4 x5 x6 x7 x8"),
      (102L, "z1 z2 z3 z4 z5 z6 z7 z8")
    ).toDF("doc_id", "text")
    val out = Corpus.memorizationReport(train, eval_, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 12, "full grid: 3 docs x 4 rungs, short docs kept")
    assert(out((100L, 4L)) == ((13L, 13L, 16L)))
    assert(out((100L, 16L)) == ((1L, 1L, 16L)))
    assert(out((100L, 32L)) == ((0L, 0L, 16L)),
      "a 16-token doc HAS no 32-grams - honest zeros, max stays 16")
    assert(out((101L, 4L)) == ((10L, 2L, 4L)),
      "the 5-token run contributes exactly two matched 4-grams")
    assert(out((101L, 8L))._2 == 0L, "no 8-token run exists")
    assert(out((102L, 4L)) == ((5L, 0L, 0L)))
    assert(out((102L, 32L)) == ((0L, 0L, 0L)))
  }

  test("readability: hand syllables (silent-e, -le, y-vowel), exact FK " +
    "cross-multiplications, negative-grade clamp, empty verdict") {
    val docs = Seq(
      // make=1 (silent e), apple=2 (-le keeps it), sky=1 (y), idea=2
      (1L, Seq("make", "apple", "sky", "idea"), 2L),
      (2L, Seq("strengths"), 1L), // FKGL = -3.4 -> clamped 0
      (3L, Seq.empty[String], 0L) // no words -> 'empty'
    ).toDF("id", "tk", "sent")
    val out = Corpus.readability(docs, "id", "tk", "sent")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // W=4 S=2 Y=6: FKGL = 0.39*2 + 11.8*1.5 - 15.59 = 2.89;
    // FRE = 206.835 - 1.015*2 - 84.6*1.5 = 77.905
    assert(out(1L) == ((4L, 2L, 6L, 28900L, 77905L, "easy")))
    assert(out(2L)._4 == 0L, "negative grade clamps to 0")
    assert(out(2L)._6 == "very_easy")
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0L, "empty")))
  }

  test("zipfSlope: rank order exact; fit equals the closed form replayed " +
    "over the same ln points; single-type corpus raises") {
    val docs = Seq("a a b", "a a b c").toDF("text")
    val out = Corpus.zipfSlope(docs, "text", topN = 64)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "a", 4L), (2L, "b", 2L), (3L, "c", 1L)))
    val (xs, ys) = (Seq(1L, 2L, 3L).map(r => math.log(r.toDouble)),
      Seq(4L, 2L, 1L).map(f => math.log(f.toDouble)))
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out.head._4 == math.floor(slope * 1e6).toLong)
    assert(out.head._5 == math.floor((sy - slope * sx) / n * 1e6).toLong)
    assert(out.head._4 < 0, "frequency falls with rank")
    val thrown = intercept[Exception] {
      Corpus.zipfSlope(Seq("a a a").toDF("text"), "text").collect()
    }
    assert(thrown.getMessage.contains("zipfSlope needs"))
  }

  test("heapsGrowth: hand prefix volumes and first-level types; beta " +
    "equals the floored ln-ratio; saturated level reads beta 0") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "e"))
      .toDF("id", "text")
    val out = Corpus.heapsGrowth(docs, "id", "text", ns = Seq(1), levels = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    // level 1 = first ceil(4/2)=2 docs: 4 grams, types {a,b,c}
    assert(out(1L) == ((2L, 4L, 3L, 0L)))
    // level 2 = all: 7 grams, types {a,b,c,d,e}
    val beta = math.floor(math.log(5.0 / 3) / math.log(7.0 / 4) * 1e6).toLong
    assert(out(2L) == ((4L, 7L, 5L, beta)))
    // a corpus repeating one doc saturates: types flat -> beta 0
    val sat = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x y"))
      .toDF("id", "text")
    val so = Corpus.heapsGrowth(sat, "id", "text", ns = Seq(1), levels = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._6).toMap
    assert(so(2L) == 0L, "no new types across the doubling -> beta 0")
  }

  test("tokenizerFertility: hand counts under a one-merge table; " +
    "word-less group reports honest zeros") {
    val docs = Seq(("x", "ab cd"), ("y", "   "))
      .toDF("grp_in", "text")
    val out = Corpus.tokenizerFertility(docs, "grp_in", "text",
        merges = Seq(("a", "b")))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    // "ab" -> 1 token (merged), "cd" -> 2 tokens: W=2 C=4 T=3
    assert(out("x") == ((1L, 2L, 4L, 3L, 1500000L, 1333333L, 333333L)))
    assert(out("y") == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("weightedSample: equals an independent MessageDigest+ln replay; " +
    "a giant weight is always picked; k >= n keeps everything; " +
    "non-positive weight raises") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def keyOf(id: Long, w: Long): Double = {
      val hex = md.digest(s"wrs:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1000000L
      math.log((h + 1).toDouble / 1000001.0) / w
    }
    val rows = (1L to 30L).map(i => (i, if (i == 7L) 1000000L else 10L))
    val expect = rows.sortBy { case (i, w) => (-keyOf(i, w), i) }.take(5)
    val out = Corpus.weightedSample(rows.toDF("id", "w"), "id", "w", k = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._2, r._3)).toSeq == expect)
    assert(out.map(_._2).contains(7L),
      "a 100000x weight is effectively certain to be picked")
    out.foreach { r =>
      assert(r._4 == math.floor(keyOf(r._2, r._3) * 1e9).toLong,
        "key_fpb equals the floored independent replay")
    }
    val all = Corpus.weightedSample(rows.toDF("id", "w"), "id", "w", k = 99)
      .collect()
    assert(all.length == 30, "k >= n keeps every row")
    val bad = Seq((1L, 0L)).toDF("id", "w")
    val thrown = intercept[Exception] {
      Corpus.weightedSample(bad, "id", "w", k = 1).collect()
    }
    assert(thrown.getMessage.contains("weights must be positive"))
  }

  test("kAnonymityAudit: hand-computed classes; all-NULL-sensitive class " +
    "suppresses; vacuous parameters are rejected") {
    val rows = Seq(
      ("A", Some(1L)), ("A", Some(1L)), ("A", Some(2L)), ("A", Some(3L)),
      ("A", Some(3L)), ("A", Some(4L)),         // size 6, 4 distinct: keep
      ("B", Some(7L)), ("B", Some(7L)), ("B", Some(7L)), // size 3: too small
      ("C", None), ("C", None), ("C", None), ("C", None), ("C", None)
    ).toDF("qi", "author")                      // C: size 5, 0 distinct
    val out = Corpus.kAnonymityAudit(rows, Seq("qi"), "author", k = 5, l = 3)
      .as[(String, Long, Long, Long, Boolean, Boolean, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 6L, 4L, 166666L, true, true, "keep")))
    assert(out("B") == (("B", 3L, 1L, 333333L, false, false, "suppress")))
    assert(out("C") == (("C", 5L, 0L, 200000L, true, false, "suppress")),
      "k-anonymous but sensitive-homogeneous (NULLs are not a value): " +
        "l-diversity is exactly what catches this class")
    val e1 = intercept[IllegalArgumentException] {
      Corpus.kAnonymityAudit(rows, Seq("qi"), "author", k = 1, l = 3)
    }
    assert(e1.getMessage.contains("k=1 is"))
    val e2 = intercept[IllegalArgumentException] {
      Corpus.kAnonymityAudit(rows, Seq("qi"), "author", k = 5, l = 1)
    }
    assert(e2.getMessage.contains("l=1 is"))
    val e3 = intercept[IllegalArgumentException] {
      Corpus.kAnonymityAudit(rows, Seq.empty, "author", k = 5, l = 3)
    }
    assert(e3.getMessage.contains("at least one"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine (the latter in
  * [[graft.queries.VectorQueries]]).
  *
  * Scale design: every method is shuffle-bounded —
  *  - exact: one hash-groupBy on a 16-byte key (map-side combine).
  *  - MinHash LSH: candidate generation is an equi-join on band keys, so the
  *    shuffle carries (doc, band-key) rows, never the O(n^2) pair space;
  *    the Jaccard estimate then prunes candidates without touching raw text.
  *  - SimHash: 48-bit fingerprint + byte-prefix blocking keeps near-dup
  *    detection an equi-join as well.
  * Brute-force n-gram Jaccard is kept as the small-scope oracle path.
  */
object Dedup {

  /** Exact duplicate groups by normalized-content fingerprint. Returns one
    * row per duplicated fingerprint: canonical (min) id, sorted ids, count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), text.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min("id").as("canonical_id"), sort_array(collect_list("id")).as("ids"),
        count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Exact-dedup keep-list: the min id per fingerprint (what a pipeline
    * would keep; everything else is dropped). */
  def exactKeep(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), text.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("id").as("keep_id"))

  /** MinHash signature table: (id, sig array<long>, shingle count). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      text.char_shingles(col(textCol), shingleSize).as("shingles"))
      .withColumn("sig", text.minhash_signature(col("shingles"), numHashes))

  /** LSH candidate pairs + MinHash-estimated Jaccard.
    * Candidates = docs sharing >= 1 band key (equi-join, not cross join);
    * est_jaccard = fraction of agreeing signature positions. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 5, numHashes: Int = 16,
                      bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    // Docs with no shingles (text shorter than the shingle) cannot be
    // near-dups; drop them so the all-sentinel signatures don't cross-match.
    val sigs = minhashSignatures(df, idCol, textCol, shingleSize, numHashes)
      .filter(size(col("shingles")) > 0)
      .withColumn("band_keys", text.lsh_band_keys(col("sig"), bands, rows))
    val banded = sigs.select(col("id"), col("sig"),
      explode(col("band_keys")).as("band_key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          x => x)).cast("double") / numHashes)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Exact n-gram Jaccard for given candidate pairs (or brute force when
    * `pairs` is a cross join) — the oracle path for LSH. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, threshold: Double,
                        maxId: Option[Long] = None): DataFrame = {
    val base = maxId.map(m => df.filter(col(idCol) < m)).getOrElse(df)
    val sh = base.select(col(idCol).cast("long").as("id"),
      text.char_shingles(col(textCol), shingleSize).as("sh"))
    val a = sh.as("a"); val b = sh.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash fingerprints (48-bit) for every doc. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      text.simhash48(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs under a Hamming threshold. Blocking: docs must
    * share one of the 4 12-bit prefixes (pigeonhole: any pair within
    * Hamming distance 3 shares at least one unchanged 12-bit block), so
    * candidate generation stays an equi-join. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(df, idCol, textCol)
      .withColumn("blocks", transform(sequence(lit(0), lit(3)), i =>
        concat(i.cast("string"), lit(":"),
          floor(col("simhash") / pow(lit(2.0), i * lit(12))).cast("long") % 4096)))
    val blocked = sh.select(col("id"), col("simhash"), explode(col("blocks")).as("blk"))
    val a = blocked.as("a"); val b = blocked.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", text.simhash_hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}

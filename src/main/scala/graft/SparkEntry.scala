package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")
  /** Registry rows whose inputs are synthesized from doc_ids / fixed
    * rules alone (r14 verdict #4's audit: `documents`/`embeddings` keep
    * their row count across the small scale factors, so these queries
    * compute IDENTICAL output on wrong-sf control data and the per-query
    * negative control could never flip them red). Each gets the in-band
    * corpus fixture tag ([[graft.Tables.corpusTag]] / [[OracleTag]], the
    * v23 fixture-version convention) appended on BOTH engine sides: the
    * wrong-sf check now fails AT THE TAG COLUMN, naming data-mismatch as
    * the cause. scripts/control_matrix.py proves every registry row can
    * flip. */
  private[graft] val controlTagged: Set[String] = Set(
    // graph panel: edges are doc_id arithmetic
    "gr1_pagerank", "gr2_pagerank_dense", "gr3_hits", "gr4_lpa",
    "gr5_kcore", "gr6_triangles", "gr7_link_predict", "gr8_assortativity",
    "gr9_seed_distance", "gr10_reciprocity", "gr11_ppr",
    // media: synthesized binary fixtures keyed by doc_id
    "m3_blank_pages", "m5_image_dhash", "m6_audio_activity",
    "m8_scene_cuts", "m9_scene_cuts_dense", "m11_image_keeplist",
    "m12_loudness", "m13_image_entropy", "m14_video_neardup",
    "m15_audio_neardup",
    // evals: judge/label/score tables derived from id hashes
    "ev2_calibration", "ev3_pass_at_k", "ev4_fleiss_kappa", "ev7_psi",
    "ev13_paired_perm", "ev14_ks_test", "ev16_krippendorff", "ev17_mcnemar",
    // preference-strength fits: synthesized comparisons
    "tr4_bt_strengths", "tr5_pl_strengths", "tr6_elo",
    // curation rows on id-hash-derived inputs
    "t21_shuffle_shards", "t50_snapshot_diff", "t66_canary_exposure",
    "u4_migrate_skip", "s11_colpali_e2e_quality")

  /** The registry BEFORE the control-tag wrap — plan guards assert
    * operator shapes here: the tag is a one-row broadcast crossJoin
    * (BroadcastNestedLoopJoin in the executed plan) that would otherwise
    * trip every join-free/map-only plan assertion with boilerplate. */
  def baseQueries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ FilterQueries.queries ++ ListingQueries.queries ++
      VectorQueries.queries ++ TextQueries.queries ++ TemporalQueries.queries ++
      PipelineQueries.queries ++ MutationQueries.queries ++ CorpusQueries.queries ++
      ClusterQueries.queries ++ SearchQueries.queries ++ GraphQueries.queries ++
      EvalQueries.queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries.map { case (name, fn) =>
      name -> (if (controlTagged(name))
        (s: SparkSession, d: String) => fn(s, d).crossJoin(
          org.apache.spark.sql.functions.broadcast(Tables.corpusTag(s, d)))
      else fn)
    }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val base =
      RelationalQueries.oracles ++ FilterQueries.oracles ++ ListingQueries.oracles ++
        VectorQueries.oracles ++ TextQueries.oracles ++ TemporalQueries.oracles ++
        PipelineQueries.oracles ++ MutationQueries.oracles ++ CorpusQueries.oracles ++
        ClusterQueries.oracles ++ SearchQueries.oracles ++ GraphQueries.oracles ++
        EvalQueries.oracles
    base.map { case (name, sql) =>
      name -> (if (controlTagged(name))
        s"SELECT __q.*, ${OracleTag.col} FROM ($sql) __q"
      else sql)
    }
  }
}

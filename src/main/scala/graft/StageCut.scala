package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Stage-cut seam for multi-consumer corpus-sized intermediates (r18,
  * verdict ask #5 — guide §5 "Memory, spill and the driver").
  *
  * The engine cuts repeated-evaluation dataflows by materializing the
  * shared subtree once (rule 14: the in-process analog of writing stage
  * outputs between passes). In LOCAL mode that is `localCheckpoint()` —
  * blocks live in executor-local storage with TRUNCATED lineage, which on
  * a real cluster means an executor loss fails the job instead of
  * recomputing, and a corpus-sized seam pins executor memory/disk. This
  * helper keeps the local default bit-for-bit identical (same eager
  * localCheckpoint, same plans) while making the cluster trade explicit
  * and switchable per deployment:
  *
  *  - `spark.graft.stageCut.mode = local` (default): `localCheckpoint` —
  *    fastest, no fault tolerance for the cut blocks; right for local
  *    runs and for seams bounded by model/sketch size.
  *  - `reliable`: `Dataset.checkpoint` to the configured checkpoint dir —
  *    survives executor loss; what a 100 TB run uses for corpus-sized
  *    seams (requires `spark.sparkContext.setCheckpointDir`).
  *  - `disk`: `persist(DISK_ONLY)` — lineage KEPT (executor loss
  *    recomputes the lost blocks), materialization deferred to the first
  *    action; the cheapest fault-tolerant option when lineage is shallow.
  *
  * Bounded seams (sketches, codebooks, class×word tables) stay plain
  * `localCheckpoint()` at call sites — they are free at any scale and
  * their loss costs one cheap recompute; this helper is for the seams
  * whose size scales WITH the corpus (shingle-hash streams, signature
  * tables, fingerprint indexes, paragraph streams).
  *
  * `label` names the seam for the plan-guard recorder: with
  * `spark.graft.stageCut.record = true` the PRE-cut optimized plan is
  * kept in [[StageCut.recorded]], so specs can assert what executes
  * INSIDE a cut stage (r17 advisor finding: after a checkpoint the
  * registry plan starts at `Scan ExistingRDD` and in-stage kernels become
  * invisible to plan guards).
  */
object StageCut {
  /** label -> formatted pre-cut plan; populated only under
    * spark.graft.stageCut.record=true (test hook, not a cache). */
  val recorded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def apply(df: DataFrame, label: String): DataFrame = {
    val conf = df.sparkSession.conf
    if (conf.get("spark.graft.stageCut.record", "false") == "true")
      recorded.put(label, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    conf.get("spark.graft.stageCut.mode", "local") match {
      case "local"    => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case "disk"     => df.persist(StorageLevel.DISK_ONLY)
      case m => throw new IllegalArgumentException(
        s"spark.graft.stageCut.mode must be local|reliable|disk (got $m)")
    }
  }
}

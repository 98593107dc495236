package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-cut seam (r18, VERDICT r17 "Next round" #7).
  *
  * The engine cuts lineage at shared or iterated subtrees
  * (PageRank tails, CC rounds, dedup shingle sets, the q96 survivor
  * corpus, the TF-IDF weights memo). Single-box, `localCheckpoint` is
  * the right tool: blocks land in the local block manager, no
  * checkpoint-dir I/O. On a real cluster it is NON-RESILIENT — the
  * lineage is severed, so losing the executor that holds a block fails
  * every downstream query — and `eager = true` blocks the driver while
  * the subtree materializes.
  *
  * This seam makes the choice deployment-driven instead of hard-coded:
  *   - local master (the bench/verify harness): `localCheckpoint`.
  *   - cluster master WITH a configured checkpoint dir: reliable
  *     `checkpoint()` — blocks are written to fault-tolerant storage,
  *     an executor loss recomputes nothing downstream.
  *   - cluster master WITHOUT a checkpoint dir: `localCheckpoint`,
  *     matching Spark's own fallback stance (fast, documented risk).
  *
  * No behavior change on the bench harness (master is `local[n]`
  * there, so every call resolves to `localCheckpoint` exactly as
  * before); the seam exists so a cluster deployment flips ALL cut
  * points at once by setting `spark.sparkContext.setCheckpointDir`.
  */
object Checkpoints {

  /** True when `df`'s session runs against a local master. */
  private def isLocal(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.master.startsWith("local")

  /** Cut lineage, eagerly materializing the frame (the common case:
    * the caller is about to fan the frame into several consumers). */
  def cut(df: DataFrame): DataFrame = cut(df, eager = true)

  /** Cut lineage. `eager = false` defers materialization to the first
    * action — use when the caller's next action already scans every
    * row (e.g. a convergence count), so one job both materializes the
    * blocks and computes the answer. */
  def cut(df: DataFrame, eager: Boolean): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (!isLocal(df) && sc.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }
}

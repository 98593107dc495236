package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for CPU-heavy per-row kernels (r18,
  * VERDICT r17 "Next round" #3: derive per-op partition choices from
  * the input instead of local[32] constants).
  *
  * A kernel whose per-row cost dwarfs its scan cost (md5 shingling,
  * MinHash permutations, SimHash bit votes, token-window explosion,
  * Bloom probes) inherits the SCAN's parallelism — which is derived
  * from input bytes / maxPartitionBytes. On a production corpus that
  * is thousands of splits and every core is busy; on a small input
  * (one sub-128 MB file → ONE split, the r18 profiled case: q97's
  * 1.7 s single-task cosine stage, q127's 1.7 s single-task Bloom
  * probe, q65's 1.2 s single-task SimHash kernel) the kernel runs
  * serially while 31 cores idle.
  *
  * [[spread]] redistributes the kernel's INPUT rows round-robin to one
  * task per core — but ONLY when the input has fewer partitions than
  * the cluster has slots. The condition makes it scale-adaptive with
  * zero configuration: at 100 TB the scan already has ≫ cores splits
  * and spread is the identity (no exchange added — the contract stated
  * in each caller's scale note survives); the repartition fires exactly
  * when its shuffle is by construction small (fewer splits than cores
  * ⇒ input < cores · maxPartitionBytes).
  *
  * Only row-wise kernels may use this: repartition() changes row-to-
  * partition assignment, so any partition-sensitive operator (stateful
  * mapPartitions carrying cross-row state, sampling keyed on partition
  * id) must not be spread. Every call site below the seam is a pure
  * per-row map or explode followed by a keyed aggregation.
  */
object Adaptive {

  /** `df` repartitioned to one task per core iff it currently has
    * fewer partitions than `defaultParallelism`; identity otherwise. */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}

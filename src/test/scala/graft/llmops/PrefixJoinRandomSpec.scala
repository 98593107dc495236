package graft.llmops

import graft.SparkSpec

/** Randomized exactness harness for the prefix-join family (r11):
  * seeded mutation corpora (jaccards spread across the thresholds, an
  * exact duplicate and an excerpt planted in each) compared against a
  * plain-Scala brute force at the AWKWARD thresholds — 1/3 and 2/3,
  * where ppm = floor(t·1e6) disagrees with half-up rounding and a
  * filter computed with round() instead of floor() would prune pairs
  * sitting in [t, round(t·1e6)/1e6) (the ADVICE r10 false-negative
  * class). The pinned-fixture spec (PrefixJoinSpec) checks known
  * shapes; this one sweeps 4 seeded corpora × 3 thresholds so the
  * boundary arithmetic is exercised on pairs nobody hand-picked. */
class PrefixJoinRandomSpec extends SparkSpec {

  import spark.implicits._

  private val K = 3

  private def shingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < K) Set(toks.mkString(" "))
    else toks.sliding(K).map(_.mkString(" ")).toSet
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Mutation corpus: docs are noisy copies of a shared base, so pair
    * jaccards land all over (0, 1); plus one exact duplicate of doc 0
    * and one excerpt (base prefix) for the j=1 / containment=1e6 rows. */
  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val pool = (0 until 12).map(i => s"w$i")
    val base = Seq.fill(10)(pool(rnd.nextInt(pool.size)))
    val docs = (0 until 8).map { i =>
      val mutated = base.map(w =>
        if (rnd.nextDouble() < 0.25) pool(rnd.nextInt(pool.size)) else w)
      val suffix = Seq.fill(rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
      (i.toLong, (mutated ++ suffix).mkString(" "))
    }
    docs :+ (100L, docs.head._2) :+ (101L, base.take(6).mkString(" "))
  }

  test("prefixFilterJoin equals brute force on seeded corpora at 1/3, 1/2, 2/3") {
    for (seed <- 1 to 4) {
      val rows = corpus(seed)
      val docs = rows.toDF("doc_id", "text")
      val sh = rows.map { case (id, t) => id -> shingles(t) }.toMap
      for (t <- Seq(1.0 / 3, 0.5, 2.0 / 3)) {
        val expected = (for {
          (a, sa) <- sh; (b, sb) <- sh if a < b
          inter = (sa & sb).size
          uni = (sa | sb).size
          j = if (uni > 0) inter.toDouble / uni else 0.0
          if j >= t
        } yield (a, b, round6(j))).toSet
        val got = Dedup.prefixFilterJoin(docs, "doc_id", "text", K, t)
          .as[(Long, Long, Double)].collect().toSet
        assert(got == expected,
          s"seed=$seed t=$t: got ${got.size}, expected ${expected.size}; " +
            s"missing=${expected -- got} extra=${got -- expected}")
      }
    }
  }

  test("containmentJoin equals brute force on seeded corpora at 2/3") {
    val t = 2.0 / 3
    val T = math.floor(t * 1e6).toLong
    for (seed <- 1 to 4) {
      val rows = corpus(seed)
      val docs = rows.toDF("doc_id", "text")
      val sh = rows.map { case (id, txt) => id -> shingles(txt) }.toMap
      val expected = (for {
        (a, sa) <- sh; (b, sb) <- sh if a != b
        ppm = (sa & sb).size.toLong * 1000000L / sa.size
        if ppm >= T
      } yield (a, b, ppm)).toSet
      val got = Dedup.containmentJoin(docs, "doc_id", "text", K, t)
        .select($"id_a", $"id_b", $"containment_ppm")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected,
        s"seed=$seed: missing=${expected -- got} extra=${got -- expected}")
    }
  }
}

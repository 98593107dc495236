package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r16 (VERDICT r15 #4): the segmented-corpus fixture and counting
  * job behind the counted CJK frequency table — quota exactness,
  * full-vocabulary realization, and the scaling convention. */
class CjkCorpusSpec extends SparkSpec {

  test("segmentedCorpus realizes exactly the proportional quotas " +
      "(floor 1) for every vocabulary word") {
    import spark.implicits._
    val budget = 200000L
    val corpus = CjkCorpus.segmentedCorpus(spark, budget).cache()
    val counts = corpus.groupBy($"word").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val entries = CjkSegmenter.corpusFrequencies
    val totalMass = entries.valuesIterator.sum
    entries.foreach { case (w, f) =>
      val expect = math.max(1L, f * budget / totalMass)
      assert(counts.get(w).contains(expect),
        s"$w: counted ${counts.get(w)} != quota $expect")
    }
    // no tokens outside the vocabulary
    assert(counts.keySet == entries.keySet)
    corpus.unpersist()
  }

  test("countedFrequencyDf scales to nominal rates: ratios preserved, " +
      "floor 1, every count >= 1 survives") {
    import spark.implicits._
    val corpus = CjkCorpus.segmentedCorpus(spark, 200000L)
    val total = corpus.count()
    val freqs = CjkCorpus.countedFrequencyDf(corpus)
      .as[(String, Long)].collect().toMap
    val counts = corpus.groupBy($"word").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    counts.foreach { case (w, c) =>
      val expect = math.max(1L, math.round(
        c.toDouble * CjkSegmenter.NominalCorpusFreq.toDouble / total))
      assert(freqs(w) == expect, s"$w: ${freqs(w)} != $expect")
    }
    // the decisive golden-reading ratio survives the round trip:
    // freq(白)·freq(天鹅) must stay well above freq(白天)·freq(鹅)
    val lhs = math.log(freqs("白").toDouble) + math.log(freqs("天鹅").toDouble)
    val rhs = math.log(freqs("白天").toDouble) + math.log(freqs("鹅").toDouble)
    assert(lhs > rhs + 0.5, s"white/swan margin collapsed: $lhs vs $rhs")
  }
}

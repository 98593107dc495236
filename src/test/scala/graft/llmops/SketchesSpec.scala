package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-operator invariants: the Bloom pre-filter admits no false
  * negatives (its exact flag must equal the exact path's flag), and
  * the count-min estimate is always an overestimate. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // doc 0 plays the eval set; docs 1-2 copy its spans verbatim,
    // doc 3 repeats one 8-token span twice (regression: all-k-probes
    // predicate must survive within-doc window duplicates), doc 4 is
    // clean.
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "xx alpha beta gamma delta epsilon zeta eta theta yy"),
    (2L, "beta gamma delta epsilon zeta eta theta iota trailing words"),
    (3L, "one two three four five six seven eight one two three four five six seven eight"),
    (4L, "entirely novel content with no overlap at all whatsoever here")
  ).toDF("doc_id", "text")

  test("bloom decontamination: exact flag matches the exact path, " +
      "candidates superset hits, within-doc dup windows survive") {
    val train = corpus.filter($"doc_id" =!= 0L)
    val eval = corpus.filter($"doc_id" === 0L)
    val bloom = Sketches.decontaminateBloom(train, eval, "doc_id", "text",
      w = 8, k = 3, mBits = 65536).collect()
    val exact = Dedup.decontaminate(train, eval, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(bloom.length == 4)
    bloom.foreach { r =>
      val (id, cand, hits, flag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(flag == exact(id), s"doc $id: bloom flag $flag != exact")
      assert(cand >= hits, s"doc $id: candidates $cand < hits $hits")
    }
    val byId = bloom.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(byId(1L) && byId(2L), "verbatim copies must be flagged")
    assert(!byId(4L), "novel doc must pass")
    // doc 3 has 9 windows but only 2 distinct spans repeated — its row
    // exists and is unflagged (no eval overlap) despite the dup span
    assert(!byId(3L))
  }

  test("production bitmap bloom (stat.bloomFilter broadcast) admits " +
      "every exact hit — no false negatives, map-side phase 1") {
    val train = corpus.filter($"doc_id" =!= 0L)
    val eval = corpus.filter($"doc_id" === 0L)
    val evalW = Dedup.tokenWindows(eval, "doc_id", "text", 8)
      .select($"h").distinct()
    // the constant-size production image: m bits regardless of eval
    // text volume, built by a distributed aggregate (no position table)
    val bf = evalW.stat.bloomFilter("h", 1000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => bfB.value.mightContainString(s))
    val trainW = Dedup.tokenWindows(train, "doc_id", "text", 8).distinct()
    val candidates = trainW.filter(mightContain($"h"))
      .select($"id", $"h").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val exactHits = trainW.join(evalW, Seq("h"), "left_semi")
      .select($"id", $"h").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(exactHits.subsetOf(candidates),
      s"bitmap bloom dropped exact hits: ${exactHits -- candidates}")
    assert(exactHits.nonEmpty, "fixture must produce at least one hit")
  }

  test("cms cells maintained incrementally on a stream equal the " +
      "batch sketch over the same tokens") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val q = Sketches.cmsCells(ms.toDF().toDF("tok"), d = 4, wCells = 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    // two waves: the second must MERGE into existing cell state, not
    // restart it — bounded state (<= d*wCells rows) is what makes the
    // watermark-free complete-mode sketch safe
    ms.addData("a", "b", "a", "c")
    q.processAllAvailable()
    ms.addData("a", "d", "b")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = Sketches.cmsCells(
        Seq("a", "b", "a", "c", "a", "d", "b").toDF("tok"), 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream cells $got != batch cells $want")
  }

  test("cms heavy hitters: estimate is always >= exact, top order kept") {
    val docs = Seq(
      (0L, "a a a a a b b b c c d e"),
      (1L, "a a b b c d d d d f")
    ).toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, "doc_id", "text",
      d = 4, wCells = 64, topN = 5).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // exact top token with its exact count survives the sketch round-trip
    assert(out.head.getString(0) == "a" && out.head.getLong(1) == 7L)
    // exact counts are non-increasing down the list
    val exacts = out.map(_.getLong(1)).toSeq
    assert(exacts == exacts.sorted.reverse)
  }
}

package graft.llmops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** [[Dedup.incrementalAdmit]] (gate q116): hand-built corpus/batch
  * verdicts, target-rule invariants on the fixture, null handling. */
class IncrementalAdmitSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val sharedA =
    "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet village roofs tonight"
  private val sharedB =
    "distributed query engines shuffle partition and broadcast data across many executor nodes to answer analytical questions fast"

  test("hand-built verdicts: exact, near, within-batch, admitted") {
    val corpus = df(Seq(0L -> sharedA, 2L -> sharedB))
    val novel =
      "completely novel text with nothing shared against any other document in this little test universe"
    val batch = df(Seq(
      1L -> sharedA, // exact copy of corpus 0
      3L -> sharedA.replace("dog", "cat"), // near-dup of corpus 0
      5L -> novel,
      7L -> novel, // within-batch exact dup of 5
      9L -> novel.replace("universe", "galaxy"))) // within-batch near dup of 5
    val out = Dedup.incrementalAdmit(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L) == ("exact_dup", 0L))
    assert(out(3L) == ("near_dup", 0L))
    assert(out(5L) == ("admitted", -1L))
    assert(out(7L) == ("exact_dup", 5L)) // within-batch exact, canon wins
    assert(out(9L) == ("near_dup", 5L)) // within-batch near vs earlier survivor
  }

  test("null-text batch docs are dropped, not classified") {
    import spark.implicits._
    val corpus = df(Seq(0L -> sharedA))
    val batch = Seq((1L, sharedA), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ids = Dedup.incrementalAdmit(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("fixture invariants: verdict partition + target rule") {
    val docs = Tables.documents(spark, sf0001)
    val out = Dedup.incrementalAdmit(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text").cache()
    val n = docs.filter(col("doc_id") % 2 === 1 && col("text").isNotNull).count()
    assert(out.count() == n)
    // matched_id present iff rejected
    assert(out.filter(col("verdict") === "admitted" &&
      col("matched_id").isNotNull).count() == 0)
    assert(out.filter(col("verdict") =!= "admitted" &&
      col("matched_id").isNull).count() == 0)
    // every match target is a corpus doc (even id) or an earlier batch doc
    assert(out.filter(col("matched_id").isNotNull &&
      col("matched_id") % 2 === 1 && col("matched_id") >= col("doc_id"))
      .count() == 0)
    // the fixture's planted duplicates must surface
    assert(out.filter(col("verdict") =!= "admitted").count() > 0)
    out.unpersist()
  }
}

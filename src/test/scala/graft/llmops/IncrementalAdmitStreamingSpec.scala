package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The streaming face of [[Dedup.incrementalAdmit]]: deliveries arrive
  * as micro-batches and the store grows by each batch's ADMITTED docs —
  * the `foreachBatch` driver loop a production ingest runs (the batch
  * operator is the per-delivery kernel; only admitted docs' band rows
  * enter the index, unlike the single-batch declarative gate where
  * exact-canonical-but-near-rejected docs stay targets — that delta is
  * the point of this spec's store semantics). */
class IncrementalAdmitStreamingSpec extends SparkSpec {

  test("wave-2 duplicates of wave-1 admitted docs are rejected against " +
      "the grown store") {
    import spark.implicits._
    val sharedA =
      "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet village roofs tonight"
    val novel =
      "fresh unseen prose describing entirely different matters of cooking bread and tending small mountain gardens"
    val corpus0 = Seq(0L -> sharedA).toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("inc-admit").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def writeWave(n: Int, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").json(s"$dir/wave$n")

    writeWave(1, Seq(11L -> novel, 13L -> sharedA.replace("dog", "cat")))

    // the store: corpus + admitted docs so far (driver-held ref, the
    // foreachBatch accumulation pattern)
    var store = corpus0
    val verdicts = scala.collection.mutable.Map[Long, (String, Option[Long])]()
    val stream = spark.readStream.schema(schema).json(s"$dir/wave*")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val out = Dedup.incrementalAdmit(store, batch, "doc_id", "text")
            .collect()
          out.foreach { r =>
            verdicts(r.getLong(0)) = (r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)))
          }
          val admitted = out.filter(_.getString(1) == "admitted")
            .map(_.getLong(0)).toSet
          store = store.unionByName(
            batch.filter(col("doc_id").isin(admitted.toSeq: _*))
              .select(col("doc_id"), col("text")))
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination()

    // wave 1: 11 novel → admitted; 13 near-dups corpus 0 → rejected
    assert(verdicts(11L) == ("admitted", None))
    assert(verdicts(13L) == ("near_dup", Some(0L)))

    // wave 2 arrives later: exact copy of the admitted 11, near copy of
    // it, and a dup of the REJECTED 13 (which never entered the store,
    // so it matches corpus 0, not 13)
    writeWave(2, Seq(
      21L -> novel,
      23L -> novel.replace("gardens", "meadows"),
      25L -> sharedA.replace("dog", "cat")))
    val q2 = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val fresh = batch.filter(col("doc_id") >= 20)
        if (!fresh.isEmpty) {
          Dedup.incrementalAdmit(store, fresh, "doc_id", "text")
            .collect().foreach { r =>
              verdicts(r.getLong(0)) = (r.getString(1),
                if (r.isNullAt(2)) None else Some(r.getLong(2)))
            }
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q2.awaitTermination()

    assert(verdicts(21L) == ("exact_dup", Some(11L)))
    assert(verdicts(23L) == ("near_dup", Some(11L)))
    // 13 was rejected, so 25's match target is the corpus doc 0
    assert(verdicts(25L)._1 == "near_dup")
    assert(verdicts(25L)._2 == Some(0L))
  }
}

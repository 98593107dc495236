package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** The streaming face of [[ChangeCapture.maintainAgg]]: CDC upsert
  * batches arrive as micro-batches and the materialized aggregate
  * advances by deltas only — the `foreachBatch` loop a warehouse sink
  * runs. After each wave the maintained view must equal a recompute
  * over the row images applied so far, without the maintenance path
  * ever rescanning them. */
class IvmStreamingSpec extends SparkSpec {

  import spark.implicits._

  test("view maintained across micro-batches equals recompute after each wave") {
    val dir = java.nio.file.Files.createTempDirectory("ivm-stream").toString
    val schema = StructType(Seq(StructField("wave", LongType),
      StructField("k", LongType), StructField("g", StringType),
      StructField("v", LongType), StructField("del", BooleanType)))
    // del=true rows are TOMBSTONES: the key leaves the image set and
    // rowImageDiff emits a D that retracts it from the view
    def writeWave(n: Long, rows: Seq[(Long, String, Long, Boolean)]): Unit =
      rows.map { case (k, g, v, d) => (n, k, g, v, d) }
        .toDF("wave", "k", "g", "v", "del")
        .coalesce(1).write.mode("overwrite").json(s"$dir/wave$n")

    // driver-held state: current row images + maintained view (the
    // foreachBatch accumulation pattern; both bounded — images by key
    // count, the view by group count)
    var images: DataFrame = Seq.empty[(Long, String, Long)].toDF("k", "g", "v")
    var view: DataFrame = images.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
    val checks = scala.collection.mutable.ArrayBuffer[Boolean]()

    def applyWave(n: Long): Unit = {
      val stream = spark.readStream.schema(schema).json(s"$dir/wave*")
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val fresh = batch.filter(col("wave") === n).drop("wave")
          if (!fresh.isEmpty) {
            val upserts = fresh.filter(!col("del")).drop("del")
            val tombstones = fresh.filter(col("del")).select("k")
            val newImages = graft.sources.Snapshots.mergeUpsert(
                images.withColumn("ver", lit(0L)),
                upserts.withColumn("ver", lit(1L)), "k", "ver").drop("ver")
              .join(tombstones, Seq("k"), "left_anti")
            val changes =
              ChangeCapture.rowImageDiff(images, newImages, "k", "g", "v")
            // pin both: the next wave must not re-derive this lineage
            view = ChangeCapture.maintainAgg(view, changes).localCheckpoint()
            images = newImages.localCheckpoint()
            val recomputed = images.groupBy("g")
              .agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
              .as[(String, Long, Long)].collect().toSet
            checks +=
              (view.as[(String, Long, Long)].collect().toSet == recomputed)
            ()
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }

    writeWave(1, Seq((1L, "a", 10L, false), (2L, "a", 20L, false),
      (3L, "b", 30L, false)))
    applyWave(1)
    // wave 2: update in place (2), group move (3: b->c), insert (4)
    writeWave(2, Seq((2L, "a", 25L, false), (3L, "c", 30L, false),
      (4L, "b", 40L, false)))
    applyWave(2)
    // wave 3: tombstone 3 (sole member of c -> group must vanish) and
    // 1, plus an upsert of 2 in the same wave
    writeWave(3, Seq((3L, "", 0L, true), (1L, "", 0L, true),
      (2L, "a", 27L, false)))
    applyWave(3)

    assert(checks.size == 3 && checks.forall(identity),
      s"maintained view diverged from recompute: $checks")
    val finalView = view.as[(String, Long, Long)].collect().toSet
    assert(finalView == Set(("a", 1L, 27L), ("b", 1L, 40L)),
      s"tombstones must retract (got $finalView)")
  }
}

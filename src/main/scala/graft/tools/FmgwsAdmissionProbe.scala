package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dev probe: does flatMapGroupsWithState admit a row whose event time
  * EQUALS the current watermark? (The built-in session aggregation does
  * — WmEdgeProbe — but the late-row filter may differ per operator.)
  *
  * wave 1: u1@0, u2@40  → wm 30 after the batch.
  * wave 2: u1@30 (ts == wm), u1@31 (ts == wm+1min), u3@100.
  * Emits one row per (user, event-minute) the state function SAW.
  */
object FmgwsAdmissionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("fmgws-admission-probe").getOrCreate()
    import spark.implicits._
    val base = 1704067200L
    val root = java.nio.file.Files.createTempDirectory("fmgws-adm").toString
    val stage = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    def toDf(rows: Seq[(Long, Long)]) =
      rows.toDF("user_id", "m")
        .withColumn("ts", timestamp_seconds(lit(base) + $"m" * 60))
        .select($"user_id", $"ts")
    val schema = toDf(Seq((1L, 0L))).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(stage)
    val seen = stream.withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Long]) =>
          val wmMs = state.getCurrentWatermarkMs()
          rows.map(r => (uid, (r._2.getTime - base * 1000) / 60000, wmMs))
      }
    val q = seen.toDF("user_id", "minute", "wm_ms").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("fmgws_adm").start()
    val waves = Seq(Seq((1L, 0L), (2L, 40L)),
      Seq((1L, 30L), (1L, 31L), (3L, 100L)))
    waves.zipWithIndex.foreach { case (rows, i) =>
      toDf(rows).coalesce(1).write.parquet(s"$stage/wave$i")
      q.processAllAvailable()
    }
    q.stop()
    spark.table("fmgws_adm").collect().map(_.toString).sorted
      .foreach(r => println("PROBE_ROW " + r))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev probe: built-in STREAMING session_window behavior when the
  * watermark lands exactly on a session's gap edge and the next wave
  * carries an event at exactly that boundary timestamp.
  *
  * gap 30 m, watermark lag 10 m.
  * wave 1: user 1 @ m=0  (session end = m=30); user 2 @ m=40
  *         → watermark after wave 1 = 40-10 = 30 == user 1's gap edge.
  * wave 2: user 1 @ m=30 (ts == wm == edge); user 3 @ m=100 → wm 90.
  *
  * Outcomes for user 1:
  *   one session  [0..60)  n=2 → state survives wm==edge AND the
  *                               boundary row is admitted (merge)
  *   two sessions [0..30) [30..60) → state evicted at equality
  *   one session  [0..30)  n=1 → boundary row dropped as late
  */
object WmEdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("wm-edge-probe").getOrCreate()
    import spark.implicits._
    val base = 1704067200L
    val root = java.nio.file.Files.createTempDirectory("wm-edge").toString
    val stage = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    def toDf(rows: Seq[(Long, Long)]) =
      rows.toDF("user_id", "m")
        .withColumn("ts", timestamp_seconds(lit(base) + $"m" * 60))
        .select($"user_id", $"ts")
    val schema = toDf(Seq((1L, 0L))).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(stage)
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session_window.start", $"session_window.end", $"n")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_edge").start()
    val waves = Seq(Seq((1L, 0L), (2L, 40L)), Seq((1L, 30L), (3L, 100L)))
    waves.zipWithIndex.foreach { case (rows, i) =>
      toDf(rows).coalesce(1).write.parquet(s"$stage/wave$i")
      q.processAllAvailable()
    }
    q.stop()
    spark.table("wm_edge").collect().map(_.toString).sorted
      .foreach(r => println("PROBE_ROW " + r))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Dev probe: trace every state-function invocation of a sessionizer
  * clone on the gap-edge fixture (u1@0,u2@40 | u1@30,u3@100; gap 30,
  * lag 10) — which calls happen, with what watermark, state, rows. */
object SessionEdgeTrace {
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, v: Double)
  case class SessionBuf(sessions: Seq[OpenSession])
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("session-edge-trace").getOrCreate()
    import spark.implicits._
    val base = 1704067200L
    val baseUs = base * 1000000L
    val gapUs = 30 * 60000000L
    val root = java.nio.file.Files.createTempDirectory("sess-trace").toString
    val stage = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    def toDf(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("user_id", "m", "value")
        .withColumn("ts", timestamp_seconds(lit(base) + $"m" * 60))
        .select($"user_id", $"ts", $"value")
    val schema = toDf(Seq((1L, 0L, 1.0))).schema
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(stage)
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    def mergeSorted(ss: Seq[OpenSession]): List[OpenSession] =
      ss.foldLeft(List.empty[OpenSession]) {
        case (prev :: rest, s) if s.startUs - prev.lastUs <= gapUs =>
          OpenSession(prev.startUs, math.max(prev.lastUs, s.lastUs),
            prev.n + s.n, prev.v + s.v) :: rest
        case (acc, s) => s :: acc
      }.reverse
    val out = stream.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, (Long, Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rawRows, state) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val fresh = rawRows.map { r =>
            val us = micros(r._2); OpenSession(us, us, 1, r._3)
          }.toSeq
          def mm(us: Long) = (us - baseUs) / 60000000L
          // scalastyle:off println
          System.err.println(s"TRACE call uid=$uid wmMin=${mm(wmUs)} " +
            s"timedOut=${state.hasTimedOut} " +
            s"prior=${prior.map(s => (mm(s.startUs), mm(s.lastUs), s.n))} " +
            s"fresh=${fresh.map(s => mm(s.startUs))}")
          val merged = mergeSorted(
            (prior ++ fresh).sortBy(s => (s.startUs, s.lastUs, s.v)))
          val (open, done) = merged.partition(s => s.lastUs + gapUs > wmUs)
          if (open.nonEmpty) {
            state.update(SessionBuf(open))
            val t = math.max(wmMs + 1, (open.map(_.lastUs).min + gapUs) / 1000)
            state.setTimeoutTimestamp(t)
            System.err.println(s"TRACE set-timeout uid=$uid atMin=${(t - base * 1000) / 60000.0}")
          } else state.remove()
          done.foreach(s => System.err.println(
            s"TRACE emit uid=$uid [${mm(s.startUs)},${mm(s.lastUs + gapUs)}) n=${s.n}"))
          done.map(s => (uid, s.startUs, s.lastUs + gapUs, s.n, s.v)).iterator
      }
    val q = out.toDF("user_id", "s", "e", "n", "v").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sess_trace").start()
    val waves = Seq(Seq((1L, 0L, 1.0), (2L, 40L, 2.0)),
      Seq((1L, 30L, 3.0), (3L, 100L, 4.0)))
    waves.zipWithIndex.foreach { case (rows, i) =>
      toDf(rows).coalesce(1).write.parquet(s"$stage/wave$i")
      q.processAllAvailable()
      System.err.println(s"TRACE ---- wave $i drained ----")
    }
    q.processAllAvailable()
    q.stop()
    spark.table("sess_trace").collect().map(_.toString).sorted
      .foreach(r => println("PROBE_ROW " + r))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** r17 optimization-round profiler: per-STAGE wall/task-time breakdown
  * for selected registry gates, so optimization effort lands where the
  * seconds actually are (guide §1.1 "empirical" — the UI is disabled in
  * this harness, so this is the stage page in text form).
  *
  * For each named gate: one warm pass (codegen/file-index warmup, the
  * Bench min-of-N convention), then a profiled pass that records every
  * stage's submit→complete wall span, summed task time, task count and
  * shuffle/input bytes. Stages overlap under concurrent jobs, so the
  * wall column is per-stage duration, not a partition of gate time.
  *
  * Usage: runMain graft.tools.GateProfile <sfDir> <gate...>
  * Env: GRAFT_PLAN_DIR=dir — also dump explain("formatted") of each
  * gate's frame to dir/<gate>.txt (the plans/r17 evidence files).
  */
object GateProfile {
  private case class St(name: String) {
    @volatile var submitMs: Long = 0L
    @volatile var doneMs: Long = 0L
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val srMb = new java.util.concurrent.atomic.AtomicLong // shuffle read bytes
    val swMb = new java.util.concurrent.atomic.AtomicLong // shuffle write bytes
    val inMb = new java.util.concurrent.atomic.AtomicLong // input bytes
    val gcMs = new java.util.concurrent.atomic.AtomicLong
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val planDir = sys.env.get("GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SCAN_PARTS", "1")) // match Bench
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = TrieMap[Int, St]()
    val enabled = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (enabled.get) {
          val st = stages.getOrElseUpdate(e.stageInfo.stageId, St(e.stageInfo.name))
          st.submitMs = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (enabled.get) stages.get(e.stageInfo.stageId).foreach { st =>
          st.doneMs = System.currentTimeMillis()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (enabled.get) stages.get(e.stageId).foreach { st =>
          st.tasks.incrementAndGet()
          val m = e.taskMetrics
          if (m != null) {
            st.taskMs.addAndGet(m.executorRunTime)
            st.gcMs.addAndGet(m.jvmGCTime)
            st.srMb.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            st.swMb.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            st.inMb.addAndGet(m.inputMetrics.bytesRead)
          }
        }
    })
    // session warmup, mirroring Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (q <- graft.SparkEntry.registry if names.contains(q.name)) {
      // warm pass
      val tw0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      val tw = (System.nanoTime() - tw0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      // profiled pass
      stages.clear(); enabled.set(true)
      val t0 = System.nanoTime()
      val df = q.run(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      enabled.set(false)
      planDir.foreach { d =>
        val p = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"${q.name}.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      println(f"\n=== ${q.name}: ${dt}%.2f s profiled (warm pass ${tw}%.2f s), ${stages.size} stages ===")
      println(f"${"stage"}%-7s ${"wall_s"}%7s ${"task_s"}%8s ${"gc_s"}%6s ${"n"}%5s ${"in_mb"}%8s ${"sr_mb"}%8s ${"sw_mb"}%8s  name")
      val rows = stages.toSeq.sortBy { case (_, st) => -(st.doneMs - st.submitMs) }
      for ((id, st) <- rows.take(30)) {
        val wall = (st.doneMs - st.submitMs) / 1e3
        println(f"$id%-7d $wall%7.2f ${st.taskMs.get / 1e3}%8.2f ${st.gcMs.get / 1e3}%6.2f ${st.tasks.get}%5d ${st.inMb.get / 1048576.0}%8.1f ${st.srMb.get / 1048576.0}%8.1f ${st.swMb.get / 1048576.0}%8.1f  ${st.name.take(90)}")
      }
      val totTask = stages.valuesIterator.map(_.taskMs.get).sum / 1e3
      println(f"[profile] ${q.name}: wall ${dt}%.2f s, summed task time $totTask%.2f s, stages ${stages.size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

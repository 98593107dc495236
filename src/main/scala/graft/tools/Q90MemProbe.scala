package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage peak-memory attribution for q90_albedo_cg_quality (r17,
  * VERDICT r16 "What's wrong" #1): the gate's per-task peak reads
  * 518.7 MB at 4-core width vs 168.5 MB at bench width, and the fix
  * depends on WHICH stage concentrates that state — a seeded fit whose
  * partitioning can be pinned, or a pool-share phenomenon that only a
  * width-aware budget can express. Runs q90 end-to-end at a chosen
  * width and prints every stage whose max task peak exceeds 32 MB,
  * with the stage name and callsite.
  *
  * Usage: SPARK_GRAFT_CPUS=4 runMain graft.tools.Q90MemProbe
  */
object Q90MemProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-q90-mem-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val peaks = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null)
          peaks.merge(e.stageId, m.peakExecutionMemory, Math.max(_, _))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        names.put(e.stageInfo.stageId,
          e.stageInfo.name.take(80) + " @ " +
            e.stageInfo.details.linesIterator.take(1).mkString.take(120))
    })

    val gate = graft.SparkEntry.registry
      .find(_.name == "q90_albedo_cg_quality").get
    gate.run(spark, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)

    import scala.jdk.CollectionConverters._
    val rows = peaks.asScala.toSeq.sortBy(-_._2)
    println(f"[q90mem] width=$cpus stages=${rows.size}")
    rows.takeWhile(_._2 > 32L * 1024 * 1024).foreach { case (sid, p) =>
      println(f"[q90mem] stage $sid%5d peak ${p / 1048576.0}%8.1f MB  ${
        names.getOrDefault(sid, "?")}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does batch session_window merge an event that arrives
  * EXACTLY gap after the previous one? (Checking the custom
  * sessionizer's merge comparator against the built-in's.) */
object GapBoundaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("gap-boundary-probe").getOrCreate()
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:30:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val sw = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n"))
    val rows = sw.collect().map(_.toString).sorted
    println("PROBE_RESULT n_sessions=" + rows.length)
    rows.foreach(r => println("PROBE_ROW " + r))
    spark.stop()
  }
}

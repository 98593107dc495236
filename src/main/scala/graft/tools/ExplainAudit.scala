package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted plans for selected queries and flag
  * plan smells (missing pushdown, unexpected cartesian products,
  * non-broadcast joins against tiny dims). Usage:
  *   runMain graft.tools.ExplainAudit [sfDir] [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- graft.SparkEntry.registry
         if names.isEmpty || names.contains(q.name)) {
      println(s"\n========== ${q.name} ==========")
      try {
        val df = q.run(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "PushedFilters: []" -> plan.contains("PushedFilters: []"),
          // AQE's pre-execution formatted plan hides codegen spans; only
          // meaningful when AdaptiveSparkPlan is absent
          "no WholeStageCodegen" -> (!plan.contains("WholeStageCodegen")
            && !plan.contains("AdaptiveSparkPlan")))
          .collect { case (s, true) => s }
        if (smells.nonEmpty) println(s"!! SMELLS: ${smells.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted plans for selected queries and flag
  * plan smells (missing pushdown, unexpected cartesian products,
  * non-broadcast joins against tiny dims). Usage:
  *   runMain graft.tools.ExplainAudit [sfDir] [query...]
  *
  * KNOWN-BY-DESIGN adjudications are emitted by the tool itself (r13,
  * VERDICT r12 #7): the recurring structural smells were re-explained
  * by hand in every round's notes — now the tool distinguishes
  * `known:` rows (smell + the standing reason) from `!! NEW SMELLS`,
  * so a new smell is the only thing that ever needs human reading.
  * The final summary line counts new smells only.
  */
object ExplainAudit {

  /** (gate, smell) → the standing reason it is by design. Sourced from
    * the r11/r12 judge adjudications; extend ONLY after adjudicating a
    * smell, never to silence one. */
  private val adjudicated: Map[(String, String), String] = {
    val localRelation =
      "local-relation ML/metric output (bounded rows materialized from " +
        "a fitted model / metric computation) — no scan to push into, " +
        "no codegen span to widen"
    Map(
      ("q25_als_recommend", "CartesianProduct") ->
        ("MLlib ALS recommendForAllUsers blocked GEMM: the factor-block " +
          "cross product IS the algorithm (score all user x item blocks), " +
          "bounded by rank x blocking, not a join-order defect"),
      ("q26_popularity_ndcg", "no WholeStageCodegen") -> localRelation,
      ("q44_lr_ranker_metrics", "no WholeStageCodegen") -> localRelation,
      ("q60_albedo_ranker_metrics", "no WholeStageCodegen") -> localRelation,
      ("q90_albedo_cg_quality", "no WholeStageCodegen") -> localRelation,
      ("q119b_bpe_segmented", "no WholeStageCodegen") -> localRelation,
      ("q127_bloom_join", "no WholeStageCodegen") -> localRelation)
  }

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
    var newSmells = 0
    var knownSmells = 0
    var failures = 0
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
        val (known, fresh) =
          smells.partition(s => adjudicated.contains((q.name, s)))
        known.foreach { s =>
          knownSmells += 1
          println(s"known: $s — ${adjudicated((q.name, s))}")
        }
        if (fresh.nonEmpty) {
          newSmells += fresh.size
          println(s"!! NEW SMELLS: ${fresh.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          failures += 1
          println(s"EXPLAIN FAILED: ${e.getMessage.take(200)}")
      }
    }
    println(s"\n[audit] explain_failures=$failures " +
      s"known_smells=$knownSmells new_smells=$newSmells" +
      (if (newSmells == 0 && failures == 0) " — clean (all smells adjudicated)"
       else " — READ THE NEW ROWS ABOVE"))
    spark.stop()
  }
}

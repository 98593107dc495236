package graft.tools

import graft.fixtures.ScaleCorpus
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-pass sf1-equivalent bench for the most expensive gates (r13,
  * VERDICT r12 #5): the r12 attribution found AQE satisfies sf0.1 legs
  * with broadcast/local plan shapes that vanish at scale (the r11 ×28
  * telemetry jump was plan-shape, not volume), so the sf0.1 bench
  * chart structurally cannot catch a shape-shift. This stages a
  * 10×-amplified corpus under a REAL table directory (the gates run
  * completely unmodified — same registry functions, different `dir`),
  * runs each gate once per scale, and diffs the POST-EXECUTION
  * adaptive plans' join/exchange composition — the final shapes AQE
  * actually chose, not the pre-execution guesses.
  *
  * Gate list = the top sf-data gates of BENCH_full r12 by wall time.
  * Fixture/model-constant gates (q90/q60/q60b — AlbedoFixtures-driven,
  * no sf tables in their lineage) are out of scope by construction.
  * q96 reads the langid-preserving amplification (the ScaleProbe
  * convention: plain token suffixing collapses every copy to lang
  * "und" and the en-filter would prune the growth away).
  *
  * Output: one JSON line on stdout —
  * {"factor":10,"gates":{name:{"sf01":s,"sf1":s,"ratio":r,
  *   "plan_shift":"...|none"}}} — plus per-gate stderr rows with the
  * full operator histograms.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        [SPARK_DRIVER_MEM=16g] runMain graft.tools.Sf1Bench
  */
object Sf1Bench {
  private val TopGates = Seq(
    "q104_pagerank",
    "q96_llm_pipeline_e2e",
    "q104b_pagerank_personalized",
    "q41_tfidf_similar_docs",
    "q105_semantic_dedup",
    "q161_prefix_join_bucketed",
    "q153_funnel_unordered_stream",
    "q103_sessionizer_late_oracle",
    "q132_prefix_jaccard_join",
    "q61_content_recommend",
    // r14 next-tier (VERDICT r13 #8): the q132 family's containment
    // siblings — the newest sf-data operators without an sf1 leg
    "q150_containment_join",
    "q162_containment_bucketed",
    // r16: the zero-knob LSH top-k at its NEW derived default (radius
    // 1, derived planes AND tables) — the operating point changed
    // this round, so its 10× ratio and final plan shape need a fresh
    // sf1 reading
    "q38_ann_lsh",
    // r18: gates whose operators were restructured this round (q98
    // single-pass window shape; q65/q64 kernel spread + q65 eager
    // cut) — the sf1 leg proves the new shapes hold at 10×
    "q98_substring_dup_scan",
    "q65_simhash_portable",
    "q64_minhash_portable")

  /** Fixture-constant gates from the r13 next-tier list (q60/q60b/q173
    * read AlbedoFixtures, not sf tables — amplifying `dir` changes
    * nothing in their lineage, so a sf0.1→sf1 ratio would be a fake
    * measurement). Run ONCE for the final-plan histogram so the
    * artifact still records their executed shape; their scale evidence
    * lives in the probe tables (FmScaleProbe apply+fit legs, the q60
    * pipeline's keyed-agg design notes in SCALE.md). */
  private val FixtureConstantGates = Seq(
    "q60_albedo_ranker_metrics", "q60b_ranker_metric_replay",
    "q173_fm_score_replay")

  private val PlanOps = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "BroadcastExchange", "AQEShuffleRead")

  private def histogram(plan: String): Map[String, Int] = {
    def count(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    val base = PlanOps.map(op => op -> count(op)).toMap
    // shuffle exchanges = Exchange nodes that are not broadcast
    base + ("ShuffleExchange" ->
      (count("Exchange") - count("BroadcastExchange")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-sf1-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // cluster-correct initial partitioning at the big scale (the r10
      // probe knob): AQE coalesces what comes out small
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage the sf1-equivalent directory ------------------------
    val root = java.nio.file.Files.createTempDirectory("sf1bench").toString
    val mainDir = s"$root/sf1"
    val langDir = s"$root/sf1lang"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(mainDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(langDir))

    val docs = Tables.documents(spark, sfDir)
    val docCarry = docs.columns.toSeq.filterNot(Seq("doc_id", "text").contains)
    ScaleCorpus.amplifyDocs(docs, factor, carry = docCarry)
      .write.mode("overwrite").parquet(s"$mainDir/documents.parquet")
    ScaleCorpus.amplifyDocsLangId(
        docs.select(col("doc_id"), col("text")), factor)
      .write.mode("overwrite").parquet(s"$langDir/documents.parquet")

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    ScaleCorpus.amplifyEmbeddings(emb, factor)
      .write.mode("overwrite").parquet(s"$mainDir/embeddings.parquet")

    val ev = Tables.events(spark, sfDir)
    val evCarry = ev.columns.toSeq
      .filterNot(Seq("event_id", "user_id", "event_type", "ts").contains)
    ScaleCorpus.amplifyEvents(ev, factor, carry = evCarry)
      .write.mode("overwrite").parquet(s"$mainDir/events.parquet")
    // the lang dir shares the amplified events (q96 doesn't read them,
    // but a shared loader seam must not 404)
    for (t <- Seq("events", "embeddings")) {
      val src = java.nio.file.Paths.get(s"$mainDir/$t.parquet")
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$langDir/$t.parquet"), src)
    }
    System.err.println(s"[sf1] staged ${factor}x corpus under $mainDir")

    // ---- run each gate once per scale, final-plan histograms -------
    val registry = graft.SparkEntry.registry.map(q => q.name -> q).toMap
    def runOnce(name: String, dir: String): (Double, Map[String, Int]) = {
      // Timer starts BEFORE run(): for most gates run() is millisecond
      // plan construction, but the streaming-replay gates (q153/q103)
      // execute their MemoryStream replay eagerly inside run() — the
      // pre-r17 timer missed it and their sweep rows timed only the
      // final local frame (SCALE.md r17 documented quirk, now fixed;
      // matches Bench.scala's run-through-write timing convention).
      val t0 = System.nanoTime()
      val df = registry(name).run(spark, dir)
      // Drive the Dataset's OWN QueryExecution: a DataFrameWriter (the
      // bench's noop sink) plans a FRESH QueryExecution around the
      // logical plan, leaving df.queryExecution un-executed and its
      // AdaptiveSparkPlan at isFinalPlan=false — the explain below
      // would then histogram the pre-execution guess, exactly the
      // thing this tool exists to not trust. toRdd executes the same
      // AdaptiveSparkPlanExec instance that explainString reports.
      df.queryExecution.toRdd.foreach(_ => ())
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (plan.contains("AdaptiveSparkPlan") &&
          !plan.contains("isFinalPlan=true"))
        System.err.println(s"[sf1] WARN $name: adaptive plan not final " +
          "after execution — histogram is the pre-execution shape")
      spark.catalog.clearCache()
      graft.ml.ModelMemo.clear()
      (secs, histogram(plan))
    }

    val fixtureRows = FixtureConstantGates.map { name =>
      val (t, h) = runOnce(name, sfDir)
      System.err.println(f"[sf1] $name (fixture-constant) t=$t%.2f " +
        s"plan: ${h.filter(_._2 > 0)}")
      f""""$name":{"fixture_constant":true,"t":$t%.3f}"""
    }

    // ---- q90-family leg (r17, VERDICT r16 "Next round" #6) ----------
    // q90 itself is fixture-constant (AlbedoFixtures lineage, no sf
    // tables), so its HEAVIEST FIT — the seeded ALS candidate
    // generator, the r16 memory offender — gets a dedicated amplified
    // leg: the fixture's interactions replicated with user-id offsets
    // (item space fixed, users and interaction volume × factor),
    // through the same train → recommendForUsers → NDCG lifecycle the
    // gate runs, with per-task peak execution memory recorded.
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) peakMem.getAndAccumulate(m.peakExecutionMemory, Math.max)
        }
      })
    def alsLeg(mult: Int): (Double, Double, Map[String, Int]) = {
      import graft.queries.QualityParity
      val base = QualityParity.fixtureInteractions(spark)
      val inter = (if (mult == 1) base
        else {
          import spark.implicits._
          val copies = (0 until mult).map(_.toLong).toDF("cp")
          base.crossJoin(broadcast(copies))
            .withColumn("user_id", col("user_id") + col("cp") * 10000000L)
            .drop("cp")
        }).cache()
      val train = inter.filter(col("ts_ns") < QualityParity.splitNs)
      val test = inter.filter(col("ts_ns") >= QualityParity.splitNs)
        .select(col("user_id"), col("item_id")).distinct()
      val users = test.select(col("user_id")).distinct()
      val ratings = train.groupBy(col("user_id"), col("item_id"))
        .agg(count(lit(1)).cast("double").as("rating"))
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      peakMem.set(0L)
      val t0 = System.nanoTime()
      val recs = graft.reco.AlsRecommender
        .train(ratings, rank = 16, regParam = 0.5, alpha = 40,
          maxIter = 8, seed = 42)
        .recommendForUsers(users, 30)
        .select(col("user_id"), col("item_id"), col("score"))
      val eval = graft.reco.RankingEvaluator.evaluate(recs, test, 30)
      eval.queryExecution.toRdd.foreach(_ => ())
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val h = histogram(eval.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      inter.unpersist()
      spark.catalog.clearCache()
      graft.ml.ModelMemo.clear()
      (secs, peakMem.get() / 1048576.0, h)
    }
    val (a1t, a1p, a1h) = alsLeg(1)
    val (aNt, aNp, aNh) = alsLeg(factor)
    val alsShifts = (a1h.keySet ++ aNh.keySet).toSeq.sorted
      .filter(k => a1h.getOrElse(k, 0) != aNh.getOrElse(k, 0))
      .map(k => s"$k:${a1h.getOrElse(k, 0)}->${aNh.getOrElse(k, 0)}")
    val alsShift = if (alsShifts.isEmpty) "none" else alsShifts.mkString(",")
    System.err.println(f"[sf1] q90_als_fit_family 1x=$a1t%.2f (peak " +
      f"$a1p%.1f MB) ${factor}x=$aNt%.2f (peak $aNp%.1f MB) " +
      f"ratio=${aNt / a1t}%.1f shift=$alsShift")
    val alsRow =
      f""""q90_als_fit_family":{"sf01":$a1t%.3f,"sf1":$aNt%.3f,""" +
        f""""ratio":${aNt / a1t}%.2f,"peak_mb_1x":$a1p%.1f,""" +
        f""""peak_mb_${factor}x":$aNp%.1f,"plan_shift":"$alsShift"}"""

    val rows = TopGates.map { name =>
      val bigDir = if (name.startsWith("q96")) langDir else mainDir
      val (t01, h01) = runOnce(name, sfDir)
      val (t1, h1) = runOnce(name, bigDir)
      val shifts = (h01.keySet ++ h1.keySet).toSeq.sorted
        .filter(k => h01.getOrElse(k, 0) != h1.getOrElse(k, 0))
        .map(k => s"$k:${h01.getOrElse(k, 0)}->${h1.getOrElse(k, 0)}")
      val shift = if (shifts.isEmpty) "none" else shifts.mkString(",")
      System.err.println(f"[sf1] $name sf01=$t01%.2f sf1=$t1%.2f " +
        f"ratio=${t1 / t01}%.1f shift=$shift")
      System.err.println(s"[sf1]   sf01 plan: ${h01.filter(_._2 > 0)}")
      System.err.println(s"[sf1]   sf1  plan: ${h1.filter(_._2 > 0)}")
      f""""$name":{"sf01":$t01%.3f,"sf1":$t1%.3f,"ratio":${t1 / t01}%.2f,"plan_shift":"$shift"}"""
    }
    spark.stop()
    println((rows ++ fixtureRows :+ alsRow).mkString(
      s"""{"factor":$factor,"sf":"$sfDir","gates":{""", ",", "}}"))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query against
  * SPARK_GRAFT_SF_DIR, prints per-query seconds as JSON. Session is
  * configured for the local[32] harness: shuffle partitions = cores
  * (not 200), AQE on for runtime coalescing / skew handling, UTC
  * session time.
  *
  * Timing methodology: each result is fully materialized through the
  * `noop` batch sink (`write.format("noop")`), which evaluates every
  * row and every projected expression but discards the bytes. Timing
  * `.count()` instead would let Catalyst prune unreferenced
  * projections, under-measuring expression-heavy queries (NOTES_r1.md
  * lesson 1; VERDICT r1 "What's wrong" #1).
  *
  * Contention robustness (VERDICT r2 "Next round" #1): the driver
  * machine is co-tenant-loaded, so a single pass measures scheduler /
  * GC noise as much as the engine — r2's recorded run showed seeded ML
  * fits at 2-4x their quiet-machine times. Two mitigations:
  *   1. best-of-N: the whole gate list runs SPARK_GRAFT_BENCH_PASSES
  *      times (default 2) and each query reports its minimum — the min
  *      is the statistic least contaminated by co-tenant interference.
  *   2. tail-window-proof output: the full per-query JSON line is
  *      ~3.5 KB and BENCH_r02 proved the driver's stdout tail window
  *      can truncate its head ("parsed": null). The full line is
  *      printed first; the LAST stdout line is a short summary
  *      ({"metric":"total",...} without the per-query map) that always
  *      fits the tail window and parses on its own.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r18 (VERDICT r17 "Next round" #3): scan parallelism derives from
      // INPUT SIZE, not a core-count floor. local[32]'s default
      // minPartitionNum = defaultParallelism = 32 splits every
      // fixture-scale single-file table (≤11 MB) into 32 sub-400 KB
      // slices — pure per-task overhead on every scan of every gate
      // (guide §2.2 over-parallelization, §6 input split sizing). With
      // the floor at 1, split count = ceil(bytes / maxPartitionBytes):
      // 1 task at sf0.1, ~800k tasks at 100 TB — the same config is
      // right at both scales BECAUSE it is size-derived. Env-overridable
      // for scale experiments; the bench contract (master, shuffle
      // partitions, methodology) is untouched.
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_MIN_SCAN_PARTS", "1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-index paths so the first timed query
    // doesn't absorb session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.lineitem(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // Exchange/spill telemetry (VERDICT r10 "Next round" #4): the q132
    // class of knee — a wide intermediate that fits at 1× and spills at
    // 100× — should be visible at 1× as shuffle VOLUME, without a 100×
    // rerun. A task-metrics listener accumulates shuffle bytes written
    // and memory+disk spill; each gate records the delta around its
    // run. The listener bus is async, so a straggling task-end event
    // can bleed into the next gate's delta — the bus is DRAINED
    // (waitUntilEmpty) after each gate so attribution is exact, not
    // sleep-raced (ADVICE r11; the former 30 ms settle misattributed
    // under load). Failed gates' partial-task bytes still attribute to
    // the failed gate — acceptable: errors are carried in the JSON, so
    // a failed gate's telemetry can never read as a clean measurement.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    // r15 (VERDICT r14 #8): per-gate peak task execution memory — a
    // 128 GiB box hides memory regressions a per-executor-GB cluster
    // would surface; the per-TASK peak is the number that transfers
    // (tasks/executor × peak ≈ executor pressure). Max across the
    // gate's tasks, reset per gate.
    val peakExecMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          peakExecMem.getAndAccumulate(m.peakExecutionMemory, Math.max)
        }
      }
    })

    // Each pass yields (name, seconds, error, shuffleMB, spillMB). A
    // failed gate's elapsed time is a fail-fast artifact, NOT a
    // measurement — r7's driver run recorded 0.06 s "wins" for gates
    // that threw (VERDICT r7 "What's wrong" #2, third recurrence of the
    // r5 q62 lesson). Errors are carried into the JSON so a failure can
    // never read as a speedup.
    def onePass(): Seq[(String, Double, Option[String], Double, Double, Double)] =
      SparkEntry.registry.map { q =>
        val t0 = System.nanoTime()
        val (s0, p0) = (shuffleBytes.get(), spillBytes.get())
        peakExecMem.set(0L) // fresh per gate (bus was drained below)
        val err: Option[String] =
          try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // exact drain; the timeout-exception fallback keeps the bench
        // alive if a listener wedges (never observed — belt only)
        try org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
        catch { case _: Throwable => Thread.sleep(30) }
        val shufMb = (shuffleBytes.get() - s0) / 1048576.0
        val spillMb = (spillBytes.get() - p0) / 1048576.0
        val peakMb = peakExecMem.get() / 1048576.0
        // queries cache intermediates; dropping them between queries keeps
        // each measurement self-contained (no cross-query GC pressure from
        // dozens of leaked cache entries in one JVM)
        spark.catalog.clearCache()
        (q.name, dt, err, shufMb, spillMb, peakMb)
      }

    // machine load bracketing the run (VERDICT r8 "Next round" #3):
    // contention adjudications keep recurring (r7 #4, r8 #1) and were
    // narrative-only; embedding /proc/loadavg makes them data.
    def loadavg(): String = scala.util.Try(
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+").take(3).mkString(" ")).getOrElse("n/a")
    val loadStart = loadavg()
    val allPasses = (1 to passes).map { i =>
      val r = onePass()
      System.err.println(f"[bench] pass $i/$passes total ${r.map(_._2).sum}%.1f s, errors ${r.count(_._3.isDefined)}")
      r
    }
    val loadEnd = loadavg()
    // per-query minimum across SUCCESSFUL passes (keyed merge — registry
    // order kept). ANY failed pass puts the gate in `errors` (a flaky
    // gate is a failure signal, not a pass); a gate that failed EVERY
    // pass additionally reports -1.0 s and is excluded from totals, so
    // its fail-fast time can never enter a total.
    val errors: Seq[(String, String)] = allPasses.head.flatMap { case (name, _, _, _, _, _) =>
      val perPass = allPasses.map(_.find(_._1 == name).get)
      val nFail = perPass.count(_._3.isDefined)
      if (nFail == 0) None
      else Some(name ->
        s"${perPass.flatMap(_._3).head} ($nFail/${perPass.size} passes failed)")
    }
    val errored = allPasses.head.collect { case (name, _, _, _, _, _)
      if allPasses.forall(_.find(_._1 == name).get._3.isDefined) => name }.toSet
    val results: Seq[(String, Double)] = allPasses.head.map { case (name, _, _, _, _, _) =>
      val ok = allPasses.flatMap(_.collect { case (`name`, t, None, _, _, _) => t })
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    // per-gate telemetry: max across passes (the conservative reading —
    // pass-to-pass variation in bytes means AQE re-planned, worth seeing)
    val shuffleMb: Seq[(String, Double)] = allPasses.head.map { case (name, _, _, _, _, _) =>
      name -> allPasses.map(_.find(_._1 == name).get._4).max
    }
    val spillMb: Seq[(String, Double)] = allPasses.head.map { case (name, _, _, _, _, _) =>
      name -> allPasses.map(_.find(_._1 == name).get._5).max
    }
    val peakMb: Seq[(String, Double)] = allPasses.head.map { case (name, _, _, _, _, _) =>
      name -> allPasses.map(_.find(_._1 == name).get._6).max
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    // per-pass raw timings (VERDICT r5 "Next round" #8): the min map alone
    // cannot distinguish co-tenant contention (one slow pass) from a
    // systematic cost (every pass slow) — r5's q44 doubling was
    // undiagnosable from the min. Ordered per pass like `queries`.
    val passesJson = allPasses.map { pass =>
      pass.map { case (k, v, err, _, _, _) =>
        "\"" + k + f"""":${if (err.isDefined) -1.0 else v}%.3f"""
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val shufJson = shuffleMb.map { case (k, v) => "\"" + k + f"""":$v%.1f""" }
      .mkString("{", ",", "}")
    val spillJson = spillMb.map { case (k, v) => "\"" + k + f"""":$v%.1f""" }
      .mkString("{", ",", "}")
    val peakJson = peakMb.map { case (k, v) => "\"" + k + f"""":$v%.1f""" }
      .mkString("{", ",", "}")
    val errsJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replaceAll("[\\x00-\\x1f\"\\\\]", " ") + "\""
    }.mkString("{", ",", "}")
    // r16 (VERDICT r15 #8): the memory telemetry becomes a GATE —
    // budgets stated, offenders named, ok=false a driver-visible
    // regression flag. Spill must stay ~0 at the bench SF (0.5 MB
    // tolerance for listener rounding) — this is the SHARP detector: a
    // plan whose task state genuinely outgrows its memory share spills.
    // The per-task peak budget is 768 MB since r17 (VERDICT r16
    // "What's wrong" #1 — the 512 MB budget flipped on machine load,
    // not regressions): peakExecutionMemory of a pool-greedy consumer
    // (hash agg / sorter growth) reads as min(need, pool/(2·active
    // tasks)) — Spark's guaranteed-share grant — so the SAME plan
    // measures 64.8 MB (= pool/64) per task at a fully-occupied
    // local[32] and 518.7 MB (= pool/8, the 4-active share) whenever
    // task launches stagger, which co-tenant load makes routine
    // (measured r17: q90 reads 518.7 at local[4] quiet, 70.7 at
    // local[32] quiet, and the loaded r16 driver run at local[32]
    // reproduced 518.7 exactly; pinning spark.buffer.pageSize did not
    // move it — the number is a share, not a data footprint). 768 MB =
    // 1.5× that documented legitimate envelope: still well below a
    // multi-share blowup (pool/4 ≈ 1 GB), so a task that genuinely
    // DEMANDS a bigger share — a new wide intermediate — flips the
    // gate, while scheduler staggering cannot. MemoryBudgetSpec
    // asserts the same 768 MB at its 4-core width, one consistent
    // story: the budget is the narrow-width share envelope.
    val spillBudgetMb = 0.5
    val peakBudgetMb = 768.0
    val spillOffenders = spillMb.collect {
      case (k, v) if v > spillBudgetMb && !errored(k) => k }
    val peakOffenders = peakMb.collect {
      case (k, v) if v > peakBudgetMb && !errored(k) => k }
    val memOk = spillOffenders.isEmpty && peakOffenders.isEmpty
    val memGateJson =
      s"""{"spill_budget_mb":$spillBudgetMb,"peak_budget_mb":$peakBudgetMb,""" +
        s""""spill_offenders":${
          spillOffenders.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""peak_offenders":${
          peakOffenders.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""ok":$memOk}"""
    val total = results.collect { case (k, v) if !errored(k) => v }.sum
    // the round-1 gate set (BENCH_r01) — its subtotal is the
    // apples-to-apples number against the 86.9 s baseline; `total`
    // additionally includes every gate added since. q42_porter_stems
    // was retired from the registry in r8 (subsumed by q42b golden);
    // q45_multimodal_features / q46_frame_samples followed in r9
    // (subsumed by q45b/q46b/q114 goldens — VERDICT r8 #8). Retired
    // names stay in this literal for the record but contribute 0;
    // dropping them can only LOWER the subtotal (their combined quiet
    // cost, ~1.9 s ≈ 5%, is documented in NOTES_r8/NOTES_r9 so the
    // cross-round comparison stays honest).
    val r1Set = Set(
      "q01_agg_pricing_summary", "q02_filter_project", "q03_join_top_revenue",
      "q04_semi_join_priority", "q05_anti_join_customers", "q06_cross_join_regions",
      "q07_window_topk", "q08_rank_ties", "q09_group_count_distinct",
      "q10_distinct", "q11_union_except", "q12_string_ops", "q13_date_math",
      "q14_case_when_bins", "q15_in_list_join", "q16_collect_list_sorted",
      "q17_theta_join", "q18_null_impute", "q20_popular_items",
      "q21_user_recent_topk", "q22_interaction_stats", "q23_item_cooccurrence",
      "q24_negative_balance", "q25_als_recommend", "q26_popularity_ndcg",
      "q27_curated_recommend", "q28_hourly_window_counts", "q29_user_sessions",
      "q30_token_stats", "q31_quality_signals", "q32_fingerprint_md5",
      "q33_exact_dedup", "q34_langid_fingerprint", "q35_minhash_near_dups",
      "q36_simhash_near_dups", "q37_ann_brute_force", "q38_ann_lsh",
      "q39_ann_ivf", "q40_label_centroids", "q41_tfidf_similar_docs",
      "q42_porter_stems", "q43_word2vec_synonyms", "q44_lr_ranker_metrics",
      "q45_multimodal_features", "q46_frame_samples", "q47_cv_grid_search",
      "q48_asof_join", "q49_user_profiles", "q50_repo_profiles",
      "q51_itemcf_recommend", "q52_rolling_windows", "q53_ngram_jaccard",
      "q54_percentiles", "q55_approx_distinct", "q56_pii_redaction")
    val r1Total = results.collect { case (k, v) if r1Set(k) && !errored(k) => v }.sum
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","baseline_set_total":$r1Total%.3f,"passes":$passes,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","errors":$errsJson,"queries":$qs,"pass_times":$passesJson,"shuffle_mb":$shufJson,"spill_mb":$spillJson,"peak_exec_mb":$peakJson,"memory_gate":$memGateJson,"sf":"$sfDir"}"""
    val shortLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","baseline_set_total":$r1Total%.3f,"passes":$passes,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","n_errors":${errors.size},"memory_ok":$memOk,"sf":"$sfDir"}"""
    spark.stop()
    // the complete per-query record must survive ANY stdout window:
    // persist it as a repo artifact too (BENCH_r04's captured window
    // truncated q01-q18 — VERDICT r4 "Next round" #6). Artifact path is
    // explicit (ADVICE r5: user.dir after spark.stop() silently lands
    // wherever the JVM was launched): SPARK_GRAFT_BENCH_OUT wins, else
    // the repo root DERIVED from this class's load location (walk up
    // from target/.../classes to the dir holding build.sbt — no
    // machine-specific literal, ADVICE r6), else cwd; the absolute
    // path is logged either way.
    val repoRoot = scala.util.Try {
      val cs = getClass.getProtectionDomain.getCodeSource
      val p = java.nio.file.Paths.get(cs.getLocation.toURI)
      Iterator.iterate(p)(_.getParent).takeWhile(_ != null).take(8)
        .find(d => java.nio.file.Files.exists(d.resolve("build.sbt")))
        .map(_.toString)
    }.toOption.flatten
    val outDir = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(repoRoot)
      .getOrElse(sys.props.getOrElse("user.dir", "."))
    // BENCH_full.json is the COMMITTED quiet-machine artifact; every
    // driver run used to clobber it with a contended reading (VERDICT
    // r7 #4, recurred r8 #1). Unattended runs now land in
    // BENCH_driver.json; only a run explicitly marked quiet
    // (SPARK_GRAFT_BENCH_COMMIT=1) may refresh the committed file.
    val artifactName =
      if (sys.env.get("SPARK_GRAFT_BENCH_COMMIT").contains("1")) "BENCH_full.json"
      else "BENCH_driver.json"
    // r18 (VERDICT r17 "Next round" #8): the full per-query line outruns
    // the driver's stdout tail window, so PERF_rN.json kept arriving
    // with per_query empty. Emit a COMPACT movers line against the
    // committed quiet artifact (BENCH_full.json at the repo root, read
    // BEFORE this run may refresh it): per-gate speedup = committed/now,
    // geomean over common gates, and the 8 strongest movers each way —
    // bounded size, always fits the tail window next to the summary.
    val moversLine: Option[String] = scala.util.Try {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get(outDir).resolve("BENCH_full.json"))
      val body = """"queries":\{(.*?)\}""".r.findFirstMatchIn(txt).map(_.group(1))
      val entry = """"([^"]+)":(-?\d+(?:\.\d+)?)""".r
      val prevMap = body.map(b => entry.findAllMatchIn(b)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap).getOrElse(Map.empty)
      val common = results.collect {
        case (k, v) if v > 0 && prevMap.getOrElse(k, -1.0) > 0 => (k, prevMap(k) / v) }
      if (common.isEmpty) None else {
        val geo = math.exp(common.map(c => math.log(c._2)).sum / common.size)
        val sorted = common.sortBy(_._2)
        def fmt(xs: Seq[(String, Double)]) =
          xs.map { case (k, r) => "\"" + k + f"""":$r%.2f""" }.mkString("{", ",", "}")
        Some(f"""{"metric":"top_movers","vs":"committed BENCH_full.json","n_common":${common.size},"geomean_speedup":$geo%.3f,"slowest":${fmt(sorted.take(8))},"fastest":${fmt(sorted.reverse.take(8))}}""")
      }
    }.toOption.flatten
    try {
      val p = java.nio.file.Paths.get(outDir).resolve(artifactName).toAbsolutePath
      java.nio.file.Files.writeString(p, fullLine + "\n")
      System.err.println(s"[bench] artifact written: $p")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed ($outDir): ${e.getMessage}")
    }
    // print after spark shutdown so no executor log line interleaves.
    // Full per-query line first (humans / history), short summary line
    // LAST — the driver's tail window always captures and parses it.
    println(fullLine)
    moversLine.foreach(println)
    println(shortLine)
    Console.out.flush()
  }
}

package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling-exponent probe for the dedup/ANN family (VERDICT
  * r5 "Next round" #5): times the 7 bucketed-path gates at 1× and N×
  * (default 10×) of the sf0.1 corpus and reports the per-gate exponent
  * log_N(t_N / t_1). A bucketed/linear plan lands ≲ 1.2 (shuffle and
  * sort terms add an n·log n flavor); a quadratic term shows up as ≳ 2.
  *
  * Both corpora are MATERIALIZED to parquet first, so each timed gate
  * reads a real table (scan included, amplification lineage excluded),
  * and each gate is timed best-of-2 through the noop sink (the Bench
  * methodology).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        SPARK_GRAFT_SCALE_FACTOR=10 runMain graft.tools.ScaleProbe
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // r10 scale-leg knob: a FIXED 32-partition shuffle is exactly
      // what cannot survive a 100× data growth (per-partition sort
      // memory grows 100× → spill → super-linear wall time). The
      // cluster-correct shape is a high initial partition count that
      // AQE coalesces back down when partitions come out small —
      // size-invariant without hurting the small scale. Default off
      // (historical probe readings stay comparable); the 100× legs
      // set it to ~16×cpus.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("scale-probe").toString
    // selective staging (r12, for the 1000× legs): amplifying EVERY
    // corpus at the probe factor is wasteful when PROBE_ONLY keeps a
    // doc-only subset — SPARK_GRAFT_STAGE=docs,emb,ev,docslang limits
    // which corpora amplify at `factor`; the rest stage at 1× (cheap,
    // type-compatible; their gates are filtered out anyway).
    val stageSel = sys.env.get("SPARK_GRAFT_STAGE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def stagedFactor(t: String): Int =
      if (stageSel.forall(_.contains(t))) factor else 1
    val docCarry = Seq("lang", "source", "n_chars")
    val docsBase = Tables.documents(spark, sfDir)
      .select((Seq("doc_id", "text") ++ docCarry).map(col): _*)
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    // materialize both scales; 1× goes through amplify(1) so both sides
    // pay identical write/read plumbing
    def stage(name: String, df: DataFrame): DataFrame = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val docs1 = stage("docs1", ScaleCorpus.amplifyDocs(docsBase, 1, carry = docCarry))
    val docsN = stage(s"docs$factor",
      ScaleCorpus.amplifyDocs(docsBase, stagedFactor("docs"), carry = docCarry))
    val emb1 = stage("emb1", ScaleCorpus.amplifyEmbeddings(embBase, 1))
    val embN = stage(s"emb$factor",
      ScaleCorpus.amplifyEmbeddings(embBase, stagedFactor("emb")))
    val evBase = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("props"))
    val ev1 = stage("ev1",
      ScaleCorpus.amplifyEvents(evBase, 1, carry = Seq("props")))
    val evN = stage(s"ev$factor",
      ScaleCorpus.amplifyEvents(evBase, stagedFactor("ev"), carry = Seq("props")))
    // the q96 e2e probe needs the langId profile to SURVIVE the copy
    // suffixing (see amplifyDocsLangId) — separate staging, text only
    val docsLang1 = stage("docslang1",
      ScaleCorpus.amplifyDocsLangId(docsBase.select(col("doc_id"), col("text")), 1))
    val docsLangN = stage(s"docslang$factor",
      ScaleCorpus.amplifyDocsLangId(docsBase.select(col("doc_id"), col("text")),
        stagedFactor("docslang")))
    // relational fact pair (r12): lineitem/orders with per-copy
    // order-key shifts — join fan-out preserved, rows ×factor
    val liBase = Tables.lineitem(spark, sfDir)
    val ordBase = Tables.orders(spark, sfDir)
    val li1 = stage("li1",
      ScaleCorpus.amplifyFacts(liBase, Seq("l_orderkey"), 1))
    val liN = stage(s"li$factor",
      ScaleCorpus.amplifyFacts(liBase, Seq("l_orderkey"), stagedFactor("facts")))
    val ord1 = stage("ord1",
      ScaleCorpus.amplifyFacts(ordBase, Seq("o_orderkey"), 1))
    val ordN = stage(s"ord$factor",
      ScaleCorpus.amplifyFacts(ordBase, Seq("o_orderkey"), stagedFactor("facts")))
    // the q99 eval side is a benchmark — constant size at every scale
    val evalDocs = docsBase.filter(col("doc_id") < 50).cache()
    evalDocs.count()
    // PQ codebook: an artifact, not a scaled input — train once on the
    // base corpus (production trains on a sample) and share both scales
    val pqCents = graft.llmops.ProductQuantization.train(
      embBase, m = 8, dim = 64, k = 16, iters = 5)
    def pqCodebook(s: SparkSession): DataFrame = {
      import s.implicits._
      pqCents.toDF()
    }

    def gates(docs: DataFrame, emb: DataFrame, ev: DataFrame,
        docsLang: DataFrame, li: DataFrame, ord: DataFrame)
        : Seq[(String, () => DataFrame)] = Seq(
      // r12: the relational core's first MEASURED legs (SCALE.md's
      // claims were narrative until now). q01f = the TPC-H Q1 shape:
      // constant group count, so the shuffle is one row per group per
      // map partition — measures scan + codegen-agg throughput. q03f
      // = fact-fact join + WIDE agg (group key is the shifted order
      // key: groups grow ×factor) + top-k — the shuffle-heavy shape.
      "q01f_pricing_agg" -> (() => li
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))),
      "q03f_join_wide_topk" -> (() => li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),
      // r11 additions (VERDICT r10 "Next round" #2): the never-probed
      // heavy composites. q96 chains five admission stages (each keyed
      // shuffle ∝ corpus); q105 is LSH pairs + hashMin CC (CC rounds
      // grow with component diameter, not corpus size — planted dups
      // are per-copy local); q104 runs 10 fixed power iterations, cost
      // ∝ edges per iteration (users ×factor fan into the SAME item
      // set, so the graph densifies exactly ×factor).
      "q96_llm_pipeline" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val TA = graft.llmops.TextAnalysis
        val admitted = docsLang.filter(col("text").isNotNull &&
          length(trim(col("text"))) >= 20)
        val en = admitted.filter(TA.langId(col("text")) === "en")
        val exactCanon = en
          .withColumn("__canon", min(col("doc_id")).over(
            Window.partitionBy(md5(col("text")))))
          .filter(col("doc_id") === col("__canon"))
          .select(col("doc_id"), col("text"))
        val pairs = Dedup.minhashCandidatesPortable(exactCanon, "doc_id",
          "text", shingleK = 2, numHashes = 32, bands = 8, threshold = 0.3)
        val labels = graft.ops.ConnectedComponents.hashMin(pairs, "id_a", "id_b")
        val survivors = exactCanon
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .filter(col("comp").isNull || col("comp") === col("doc_id"))
          .select(col("doc_id"), col("text"))
        TA.chunkDocs(survivors, "doc_id", "text",
          chunkChars = 200, overlapChars = 50)
      }),
      // nTables derives via the operator default since r13
      // (lshTablesFor at the design cos — the gate path)
      "q105_semantic_dedup" -> (() => Similarity.semanticDedup(
        emb, threshold = 0.4,
        nPlanes = Similarity.autoPlanes(emb, Similarity.NearDupOccupancy),
        dim = 64)),
      "q104_pagerank" -> (() => {
        val edges = ev.select(col("user_id").cast("long").as("src"),
            (get_json_object(col("props"), "$.k").cast("long") + 100000L)
              .as("dst"))
          .filter(col("dst").isNotNull).distinct()
        graft.ops.PageRank.run(edges, iters = 10)
      }),
      // r8 late-session additions: funnel/interval are per-user-keyed
      // (work ∝ users), prefix join's candidates live in the rare
      // shingle tail, IVM's delta path is ∝ change volume
      // r11 addition: the last unprobed top-5 gate — the Bayardo
      // prefix-filtered TF-IDF similarity join ("the published 100 TB
      // construction"). amplifyDocs gives each copy a disjoint
      // vocabulary, so this models corpus growth by NEW content:
      // vocab ×factor, posting lengths flat. Watch the copy-suffixed
      // stopwords ("thecp1"): they dodge the stopword list, carry big
      // tf, and can capture top-m prefix slots with posting lists
      // ~n_base long — if the exponent spikes, that term-frequency
      // skew is the first suspect (maxDfFrac is corpus-relative and
      // stops pruning them once copies dilute df below 0.8·n).
      // default path (cap 2048 — does NOT bind on this corpus: per-copy
      // postings peak ~1164, so this leg measures the uncapped volume,
      // 145M pairs at 10× / 1.45B at 100×; needs SPARK_DRIVER_MEM≥48g
      // at 100× on local[32])
      // allowCapTruncation on every probe leg: plans stay byte-identical
      // to the r11 measurements (the strict guard's cache-scan count is
      // a GATE contract, not a probe one)
      "q41_tfidf_prefix_join" -> (() => graft.reco.ContentRecommender
        .similarDocsPrefix(docs, "doc_id", "text", k = 10, m = 4,
          allowCapTruncation = true)),
      // CONTRAST leg: champion cap at 256 — the knob a 100 TB corpus
      // with hot postings would run; bounds candidate volume ≤ m·cap·n
      "q41_tfidf_cap256" -> (() => graft.reco.ContentRecommender
        .similarDocsPrefix(docs, "doc_id", "text", k = 10, m = 4,
          postingCap = 256, allowCapTruncation = true)),
      // the q61 SERVING shape: a FIXED query working set against the
      // growing corpus — the semi-join restricts the a-side before the
      // term join and the champion cap bounds the b-side posting each
      // query term meets (per-query fan-out ≤ m·cap), so the leg
      // should be index-build-dominated (linear), not pair-dominated
      "q61_serving_queries" -> (() => {
        val queryIds = docs.select(col("doc_id"))
          .filter(col("doc_id") < 20)
        graft.reco.ContentRecommender.similaritiesForQueries(
          docs, queryIds, "doc_id", "text", m = 4,
          allowCapTruncation = true)
      }),
      "q122_funnel" -> (() => graft.ops.Funnel.stepTimes(ev,
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))),
      "q130_interval_join" -> (() => {
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("l_id"),
            unix_micros(col("ts")).as("ls"),
            (unix_micros(col("ts")) + 3600000000L).as("le"))
        val r = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("r_id"),
            unix_micros(col("ts")).as("rs"),
            (unix_micros(col("ts")) + 1800000000L).as("re"))
        graft.ops.IntervalJoin.overlapJoin(l, r, "user_id", 3600000000L)
      }),
      "q132_prefix_join" -> (() => Dedup.prefixFilterJoin(
        docs, "doc_id", "text", shingleK = 3, threshold = 0.5)),
      // r12: the BUCKETED verify at the single-box disk limit. The
      // join verify (default, r11 A/B winner at ≤100×) moves the
      // pair×array intermediate once per pair (~1.5 TB raw at 1000× —
      // it died on this machine's disk); the bucketed plan ships each
      // doc's array ≤ verifyBuckets times and pairs as 5 narrow longs,
      // so the SAME query fits. 256 buckets bound per-task heap at
      // ~140 MB for the 1000× corpus (see bucketedIntersections'
      // memory contract).
      "q132v_bucketed256" -> (() => Dedup.prefixFilterJoin(
        docs, "doc_id", "text", shingleK = 3, threshold = 0.5,
        verifyBuckets = 256)),
      "q123_ivm" -> (() => {
        val o = docs.select(col("doc_id").as("k"),
          (length(col("text")) % 10).as("g"),
          length(col("text")).cast("long").as("v"))
        val n = o.filter(col("k") % 7 =!= 0)
          .withColumn("v", when(col("k") % 5 === 0, col("v") * 2)
            .otherwise(col("v")))
        val oldAgg = o.groupBy("g")
          .agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
        graft.ops.ChangeCapture.maintainAgg(oldAgg,
          graft.ops.ChangeCapture.rowImageDiff(o, n, "k", "g", "v"))
      }),
      "q33_exact_dedup" -> (() => Dedup.exact(docs, "doc_id", "text")),
      "q35_minhash" -> (() => Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleK = 2, numHashes = 64, bands = 16, threshold = 0.3)),
      "q64_minhash_portable" -> (() => Dedup.minhashCandidatesPortable(
        docs, "doc_id", "text", shingleK = 2, numHashes = 32, bands = 8,
        threshold = 0.3)),
      // r12: the simhash production kernel was never 100×-probed. The
      // minimal (maxHamming+1, 1) blocking has FIXED 16-bit keys, so
      // random-pair candidate volume grows ~ n²·4/2¹⁶ — the r6
      // fixed-nPlanes shape (measured SATURATED at 5M docs). The Manku
      // (6,3) contrast leg pays 20 index rows/doc for ~32-bit keys
      // (2¹⁶× sparser buckets). Since r13 the DEFAULT leg derives
      // (kBlocks, keyBlocks) from the corpus via simhashBlocksFor —
      // block16 is now an explicit contrast, no longer the default.
      "q65s_simhash_block16" -> (() => Dedup.simhashPairs(
        docs, "doc_id", "text", maxHamming = 3, kBlocks = 4, keyBlocks = 1)),
      "q65s_simhash_manku63" -> (() => Dedup.simhashPairs(
        docs, "doc_id", "text", maxHamming = 3, kBlocks = 6, keyBlocks = 3)),
      "q65s_simhash_derived" -> (() => Dedup.simhashPairs(
        docs, "doc_id", "text", maxHamming = 3)),
      "q79_dup_clusters" -> (() => graft.ops.ConnectedComponents.hashMin(
        Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
          shingleK = 2, numHashes = 32, bands = 8, threshold = 0.3),
        "id_a", "id_b")),
      // the GATE's own derivation (autoPlanes at the near-dup occupancy
      // target; nTables via lshTablesFor since r13) — this leg IS the
      // default path: as the corpus grows both planes AND tables rise,
      // so the timed work includes the recall-holding table cost
      // (n^1.22 by the lshTablesFor law, not the fixed-8 n^1.0)
      "q97b_lsh_near_dup_pairs" -> (() => Similarity.lshNearDupPairsPortable(
        emb, threshold = 0.4,
        nPlanes = Similarity.autoPlanes(emb, Similarity.NearDupOccupancy),
        dim = 64)),
      "q98_substring_dup_scan" -> (() => Dedup.substringDupScan(
        docs, "doc_id", "text")),
      "q99_decontaminate" -> (() => Dedup.decontaminate(
        docs, evalDocs, "doc_id", "text")),
      // r8 sketch/retrieval additions: all should stay ~linear — the
      // Bloom image and CM cells are constant-size state, the hybrid
      // rankers keep only query-term postings in the shuffle
      "q110_bloom_decontaminate" -> (() => graft.llmops.Sketches
        .decontaminateBloom(docs, evalDocs, "doc_id", "text")),
      "q111_cms_heavy_hitters" -> (() => graft.llmops.Sketches
        .cmsHeavyHitters(docs, "doc_id", "text")),
      "q113_hybrid_rrf" -> (() => {
        val terms = Seq("spark", "window", "merge")
        graft.text.HybridSearch.rrfFuse(
          graft.text.Bm25.search(docs, "doc_id", "text", terms, topK = 20),
          graft.text.HybridSearch.queryLikelihood(docs, "doc_id", "text",
            terms))
      }),
      // r8 session additions: PQ search is encode (map-side) + one
      // keyed sum — linear; IVF-PQ adds cell pruning on top;
      // incremental admission is the q64 band join restricted to the
      // batch side
      "q115_pq_adc" -> (() => graft.llmops.ProductQuantization.adcTopK(
        emb, pqCodebook(spark), k = 10, m = 8, dim = 64,
        queryPred = col("vec_id") < 8)),
      "q116_incremental_admit" -> (() => Dedup.incrementalAdmit(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")),
      "q117_ivf_pq" -> (() => Similarity.ivfPqTopKPortable(
        emb, pqCodebook(spark), k = 10, m = 8, dim = 64, nProbe = 2,
        queryPred = col("vec_id") < 8)),
      // r9 additions (VERDICT r8 #6): DSIR is two constant-size
      // hashed-bucket models + one scoring scan; BPE's per-round cost
      // is the word-count agg (rounds bounded); HLL rollup is
      // constant-size sketch merges; budgeted selection is one
      // per-source running-sum window (budget fixed as the corpus
      // grows — the production shape)
      "q118_dsir" -> (() => graft.llmops.Quality.dsirScores(docs,
        col("lang") === "en", "doc_id", "text", nBuckets = 1024)),
      "q119_bpe" -> (() => graft.text.Bpe.train(docs, "text",
        maxWords = 2000, rounds = 10)._1),
      "q131_hll_reagg" -> (() => {
        val e = ev.select(
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          expr("unix_micros(ts) DIV 86400000000 DIV 7").as("week"),
          col("user_id"))
        val daily = e.groupBy(col("week"), col("day"))
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        daily.groupBy(col("week"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      }),
      "q137_budgeted" -> (() => graft.llmops.Quality.budgetedSelection(
        docs, "source", "doc_id",
        tokenExpr = size(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).cast("long"),
        qualityExpr = col("n_chars"), budgetPerSource = 800L)),
      // r9 additions: sampling is one window shuffle on the group;
      // containment's left side ships rare-tail prefixes only (the
      // q132 family), right side is the posting index
      "q146_group_sample" -> (() => graft.ops.Sampling.viaWindow(
        docs, "source", "doc_id", 20, "s9")),
      "q150_containment" -> (() => Dedup.containmentJoin(
        docs, "doc_id", "text", shingleK = 3, threshold = 0.8)),
      // the quantile z-order SCALE path (sketch edges + map-side
      // assignment — the rank-window form is the oracle vehicle and
      // deliberately not probed)
      "q151s_zorder_qscale" -> (() => graft.ops.ZOrder
        .quantileBucketedEventsScale(
          ev.withColumn("ts_ns", expr("unix_micros(ts) * 1000")), 8)))

    // best-of-N; SPARK_GRAFT_PROBE_PASSES=1 for the very long 1000×
    // legs (a single pass of a 10-minute gate is still adjudication
    // data — the contention term is ≪ the measured quantity there)
    val probePasses = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2")
      .toInt.max(1)
    def time(mk: () => DataFrame): Double = {
      val ts = (1 to probePasses).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    // optional comma-separated name-prefix filter for targeted runs
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def keep(n: String) = only.forall(_.exists(n.startsWith))
    // FAIL FAST on 1×-staged corpora (ADVICE r12): with SPARK_GRAFT_STAGE
    // excluding a corpus, its N-side frame stages at 1× under the
    // Nx-named path — a gate reading it would compare 1× vs 1× and emit
    // a ~1.0 exponent indistinguishable from genuine Nx adjudication
    // data. Refuse to run any selected gate whose corpus tag was staged
    // at 1× while factor > 1, instead of relying on the operator to
    // keep PROBE_ONLY and STAGE consistent by hand.
    val corpusTag: String => String = name =>
      if (name.startsWith("q01f") || name.startsWith("q03f")) "facts"
      else if (name.startsWith("q96")) "docslang"
      else if (name.startsWith("q105") || name.startsWith("q97b") ||
        name.startsWith("q115") || name.startsWith("q117")) "emb"
      else if (name.startsWith("q104") || name.startsWith("q122") ||
        name.startsWith("q130") || name.startsWith("q131") ||
        name.startsWith("q151s")) "ev"
      else "docs"
    if (factor > 1 && stageSel.isDefined) {
      val offending = gates(docs1, emb1, ev1, docsLang1, li1, ord1)
        .map(_._1).filter(keep)
        .filter(n => stagedFactor(corpusTag(n)) == 1)
      if (offending.nonEmpty) throw new IllegalStateException(
        s"ScaleProbe: factor=$factor but these selected gates read a " +
          s"corpus SPARK_GRAFT_STAGE left at 1x — their ratios would be " +
          s"fake ~1.0 rows: ${offending.mkString(", ")}. Narrow " +
          "SPARK_GRAFT_PROBE_ONLY to the staged corpora's gates or add " +
          "the missing tags to SPARK_GRAFT_STAGE " +
          s"(tags: ${offending.map(corpusTag).distinct.mkString(", ")}).")
    }
    val g1 = gates(docs1, emb1, ev1, docsLang1, li1, ord1).filter(p => keep(p._1))
    val gN = gates(docsN, embN, evN, docsLangN, liN, ordN).filter(p => keep(p._1))
    var t1Lsh = 0.0
    val rows = g1.zip(gN).map { case ((name, mk1), (_, mkN)) =>
      val t1 = time(mk1)
      val tN = time(mkN)
      if (name.startsWith("q97b")) t1Lsh = t1
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      System.err.println(f"[scale] $name t1=$t1%.2f t$factor=$tN%.2f exp=$exp%.2f")
      f""""$name":{"t1":$t1%.3f,"tN":$tN%.3f,"exponent":$exp%.3f}"""
    }
    // CONTRAST leg: q97b with the planes FROZEN at the 1×-corpus
    // operating point — sign-LSH bucket count is 2^nPlanes per table,
    // so candidate volume at fixed planes grows ~ n²/2^nPlanes,
    // super-linear BY CONSTRUCTION. The default leg above derives
    // planes via autoPlanes, so this measures what NOT scaling the
    // planes would cost (r6: exponent 1.41 fixed vs 0.21 derived).
    // nTables stays pinned at 8 here — the r6-comparable operating
    // point; this leg isolates the PLANES variable, not tables.
    // skipped when a PROBE_ONLY filter excluded the q97b base leg
    val contrastRows = if (t1Lsh > 0) {
      val frozenPlanes = Similarity.autoPlanes(emb1, Similarity.NearDupOccupancy)
      val tFixed = time(() => Similarity.lshNearDupPairsPortable(
        embN, threshold = 0.4, nPlanes = frozenPlanes, dim = 64, nTables = 8))
      val expFixed = math.log(tFixed / t1Lsh) / math.log(factor.toDouble)
      System.err.println(
        f"[scale] q97b_fixed_planes(planes=$frozenPlanes) t$factor=$tFixed%.2f exp=$expFixed%.2f")
      Seq(
        f""""q97b_fixed_planes":{"t1":$t1Lsh%.3f,"tN":$tFixed%.3f,"exponent":$expFixed%.3f,"nPlanes":$frozenPlanes}""")
    } else Seq.empty
    spark.stop()
    println((rows ++ contrastRows)
      .mkString(s"""{"factor":$factor,"sf":"$sfDir","gates":{""", ",", "}}"))
  }
}

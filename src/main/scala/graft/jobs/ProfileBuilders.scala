package graft.jobs

import graft.ops.exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering jobs mirroring the reference's profile builders
  * (reference: src/main/scala/ws/vinta/albedo/UserProfileBuilder.scala
  * and RepoProfileBuilder.scala; lifecycle traced in SURVEY.md §3.1).
  *
  * Every step is a column expression or key-partitioned shuffle — no
  * UDFs, no driver loops; the shape survives a 1000-executor scale-up:
  * per-user windows shuffle once on user_id, frequency binning joins a
  * count table instead of collecting it.
  */
object ProfileBuilders {

  private val bioFlagKeywords = Map(
    "has_ml" -> Seq("machine learning", "data scien"),
    "has_fullstack" -> Seq("fullstack", "full-stack"),
    "has_backend" -> Seq("backend", "devops"),
    "has_phd" -> Seq("phd"))

  /** User profile: impute → clean → flag → ratios/recency → per-user
    * top-k starred languages → frequency binning. */
  def buildUserProfile(users: DataFrame, repos: DataFrame,
      starrings: DataFrame, snapshotDate: String, topK: Int = 50,
      binMinCount: Int = 5): DataFrame = {
    val snap = to_date(lit(snapshotDate))

    // 1. null flags + imputation (ref :60-66)
    val imputed = users
      .withColumn("user_has_null", exprs.anyNullFlag(
        Seq(col("user_company"), col("user_location"), col("user_email"),
          col("user_bio"))))
      .na.fill("", Seq("user_company", "user_location", "user_email", "user_bio"))

    // 2. cleaning (ref :70-74, closures/UDFs.scala — as column exprs)
    val cleaned = imputed
      .withColumn("clean_company", exprs.cleanCompany(col("user_company")))
      .withColumn("clean_location", exprs.cleanLocation(col("user_location")))
      .withColumn("email_domain", exprs.emailDomain(col("user_email")))

    // 3. bio keyword flags (ref :80-92,128-139)
    val flagged = bioFlagKeywords.foldLeft(cleaned) { case (df, (name, words)) =>
      df.withColumn(name, exprs.containsAnyFlag(lower(col("user_bio")), words))
    }

    // 4. ratios + recency vs frozen snapshot (ref :140-145)
    val derived = flagged
      .withColumn("follower_following_ratio",
        round(col("user_followers_count") /
          (col("user_following_count") + lit(1.0)), 3))
      .withColumn("days_since_updated",
        datediff(snap, col("user_updated_at")))
      .withColumn("days_since_created",
        datediff(snap, col("user_created_at")))

    // 5. per-user top-K recent starred languages (ref :99-125 — replaces
    //    the pack/unpack concat_ws round-trip with a sorted struct list)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("starred_at").desc, col("repo_id"))
    val recentLangs = starrings
      .join(repos.select(col("repo_id"), col("repo_language")), Seq("repo_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .groupBy(col("user_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("rn"), col("repo_language")))),
        _.getField("repo_language")).as("recent_languages"),
        count(lit(1)).as("n_recent"))

    // 6. frequency binning of clean_company (ref :177-195) — join the
    //    count table, no driver collect
    val companyCounts = flagged.groupBy(col("clean_company"))
      .agg(count(lit(1)).as("company_cnt"))
    derived
      .join(companyCounts, Seq("clean_company")) // broadcast-eligible count table
      .withColumn("company_binned",
        exprs.binByCount(col("company_cnt"), col("clean_company"), binMinCount))
      .join(recentLangs, Seq("user_id"), "left")
      .select(Seq(col("user_id"), col("user_account_type"),
        col("user_has_null"), col("clean_company"), col("company_binned"),
        col("clean_location"), col("email_domain"),
        col("follower_following_ratio"), col("days_since_updated"),
        col("days_since_created"), col("recent_languages"), col("n_recent")) ++
        bioFlagKeywords.keys.toSeq.sorted.map(col): _*)
  }

  /** Repo profile: flags, recency, topics split, language binning
    * (ref RepoProfileBuilder.scala:63-144). */
  def buildRepoProfile(repos: DataFrame, snapshotDate: String,
      binMinCount: Int = 30): DataFrame = {
    val snap = to_date(lit(snapshotDate))
    val base = repos
      .withColumn("repo_has_description", col("repo_description") =!= "")
      .withColumn("repo_is_unmaintained", exprs.likeAny(
        lower(col("repo_description")), Seq("%unmaintained%", "%deprecated%")))
      .withColumn("repo_days_since_updated", datediff(snap, col("repo_updated_at")))
      .withColumn("repo_recently_pushed",
        datediff(snap, col("repo_updated_at")) <= 60)
      .withColumn("stars_band",
        when(col("repo_stargazers_count") < 1000, "small")
          .when(col("repo_stargazers_count") < 90000, "medium")
          .otherwise("large"))
      .withColumn("topics_list",
        when(col("repo_topics") === "", array().cast("array<string>"))
          .otherwise(split(col("repo_topics"), ",")))
      .withColumn("log_stars",
        round(log10(col("repo_stargazers_count") + 1) * 1000) / 1000)
    val langCounts = base.groupBy(col("repo_language"))
      .agg(count(lit(1)).as("lang_cnt"))
    base.join(langCounts, Seq("repo_language"))
      .withColumn("language_binned",
        exprs.binByCount(col("lang_cnt"), col("repo_language"), binMinCount))
  }
}

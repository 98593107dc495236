package graft.sources

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}

/** Create-if-missing snapshot memoization, keyed by an explicit
  * snapshot date.
  *
  * Reference: DatasetUtils.loadOrCreateDataFrame (reference:
  * src/main/scala/ws/vinta/albedo/utils/DatasetUtils.scala:36-50) — try
  * parquet read, on "Path does not exist" compute + write + re-read;
  * and ModelUtils.loadOrCreateModel (utils/ModelUtils.scala:7-21) for
  * ML models. The reference keyed snapshots on LocalDateTime.now
  * (settings/package.scala:15-19) — non-deterministic; here the date is
  * an injected parameter (SURVEY.md §7.4).
  */
object Snapshots {

  def path(baseDir: String, snapshotDate: String, name: String): String =
    s"$baseDir/$snapshotDate/$name.parquet"

  /** Read the memoized snapshot if present, else compute, persist,
    * and return the persisted copy (so downstream reads columnar). */
  def loadOrCreate(spark: SparkSession, baseDir: String,
      snapshotDate: String, name: String)(compute: => DataFrame): DataFrame = {
    val p = path(baseDir, snapshotDate, name)
    try spark.read.parquet(p)
    catch {
      case e: AnalysisException if e.getMessage.contains("does not exist") =>
        compute.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
    }
  }

  /** Hive-style partitioned snapshot write: at 100 TB the snapshot MUST
    * be partitioned so date/key predicates prune whole directories at
    * planning time (the reference's flat daily snapshots re-scan
    * everything — SURVEY.md §2.1 #3). Readers filtering on
    * `partitionCols` get PartitionFilters, not data filters. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** SCD-1 snapshot upsert: merge `updates` into `base` by key, the
    * row with the highest `versionCol` (ties → update side) wins. The
    * daily-snapshot refresh the reference's pipeline implies (sync jobs
    * re-pull changed rows; the snapshot must converge to latest).
    *
    * Scale: one shuffle on the key — union → per-key max-version
    * filter via window. No driver state; at 100 TB this is the
    * standard merge shape (Delta/Iceberg MERGE INTO compiles to the
    * same join-or-window plan). */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keyCol: String,
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__side").desc)
    base.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__side")
  }

  /** Model flavor: load an MLWritable/MLReadable model or fit + save.
    * Reference: ModelUtils.loadOrCreateModel. */
  def loadOrCreateModel[M <: org.apache.spark.ml.util.MLWritable](
      path: String, load: String => M)(fit: => M): M = {
    try load(path)
    catch {
      case _: Exception =>
        val m = fit
        m.write.overwrite().save(path)
        m
    }
  }
}

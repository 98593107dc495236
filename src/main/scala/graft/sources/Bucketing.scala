package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-partitioned-at-rest) tables — the co-located-join
  * discipline for keys that are joined REPEATEDLY at scale (SURVEY
  * §2.12 row 94's companion: `repartition` co-locates for ONE plan,
  * bucketing persists the co-location so every subsequent join on the
  * bucket key skips its shuffle entirely).
  *
  * At 100 TB this is the difference between re-shuffling a fact table
  * per query and paying the layout cost once at ingest: two tables
  * bucketed by the same key into the same bucket count sort-merge-join
  * with ZERO Exchange on either side (BucketedJoinSpec proves the plan
  * shape), and a single bucketed table still saves its own exchange
  * joining against any co-partitioned output. Spark's bucketing is the
  * built-in form of the Hive/Iceberg layout contract — the engine uses
  * it rather than hand-rolling directory partitioning by hash.
  *
  * Reference note: the reference re-shuffles its ratings/repo tables
  * on every join (plain parquet snapshots — DatasetUtils.scala:36-50);
  * bucketing is the at-rest upgrade its daily-snapshot pattern admits.
  */
object Bucketing {

  /** Create-if-missing bucketed external parquet table: `df` written
    * once per (session catalog, `table`) bucketed+sorted by `key` into
    * `nBuckets`, registered in the session catalog (bucketed reads
    * resolve through the catalog — a plain parquet path read has no
    * bucket metadata). Reuse across a session's gates/passes is by
    * catalog lookup; a fresh driver re-creates under its own path.
    * The write is one shuffle by `key` (the layout cost paid once). */
  def bucketedTable(spark: SparkSession, table: String, path: String,
      df: => DataFrame, key: String, nBuckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(nBuckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    }
    spark.table(table)
  }

  /** Session-scoped staging dir for bucketed-table gates (one temp
    * root per session, memoized — gates re-running in later bench
    * passes reuse the catalog entry, not re-stage). */
  def sessionRoot(spark: SparkSession): String =
    graft.ml.ModelMemo.cached(spark, "bucketing-root")(
      java.nio.file.Files.createTempDirectory("graft-bucketed").toString)
}

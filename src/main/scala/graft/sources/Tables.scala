package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader seam over the engine's at-rest tables.
  *
  * Mirrors the reference's loader API shape (`DatasetUtils.loadRaw*DS`,
  * reference: src/main/scala/ws/vinta/albedo/utils/DatasetUtils.scala:52-146)
  * where every job goes through one named-loader layer rather than raw
  * paths. Here the storage is parquet fixtures (TESTDATA.md); on a real
  * cluster the same seam would resolve catalog tables, so nothing above
  * this file knows about file layout.
  *
  * Scale note: `spark.read.parquet` gives Catalyst the native vectorized
  * parquet source — predicate pushdown, column pruning and partition
  * coalescing all apply. Callers must `select` only what they need so
  * pruning reaches the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as long nanos and surface a proper
      // timestamp column alongside (micros precision). The conf set is
      // a fallback for ad-hoc sessions — Bench/Verify set it at build
      // time; the write is idempotent (always "true") so a concurrent
      // double-set is benign.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      // integer division — double `/ 1000` loses ns precision near 1.7e18
      // (ulp 256 ns) and can diverge from DuckDB's exact ns→µs truncation
      raw.withColumn("ts_ns", col("ts").cast("long"))
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

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

  /** r17 optimization round: `spark.read.parquet` runs a driver-side
    * schema-inference job (a footer read) on EVERY call, and gates load
    * 1–3 tables each — ~50–120 ms × hundreds of loads per bench run of
    * pure fixed overhead (profiled as the per-gate `parquet at
    * Tables.scala` stages). Memoize the lazily-planned HANDLE per
    * (session, dir, table): schema inference and file listing happen
    * once per session — exactly what a catalog table gives a real
    * deployment (guide §6, file-listing caching). No data or results
    * are cached: every action on the handle still scans the parquet
    * inputs. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ml.ModelMemo.cached(spark, s"table:$dir:$name")(load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // The events fixture has shipped in two layouts over time:
      //   (a) ts as INT64 TIMESTAMP(NANOS) — readable only with the
      //       nanosAsLong conf, surfacing as LongType nanoseconds;
      //   (b) ts as timestamp[us] — surfacing as TIMESTAMP_NTZ.
      // Branch on the loaded dtype so either layout yields the same
      // contract: `ts` TIMESTAMP (µs precision, session tz = UTC in
      // all entry points) + `ts_ns` long nanos-since-epoch. The conf
      // set is idempotent ("true" always) and required *before* schema
      // inference for layout (a); harmless for (b).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType =>
          // integer division — double `/ 1000` loses ns precision near
          // 1.7e18 (ulp 256 ns) and can diverge from DuckDB's exact
          // ns→µs truncation
          raw.withColumn("ts_ns", col("ts").cast("long"))
            .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
        case TimestampNTZType | TimestampType =>
          // NTZ wall time → instant via session tz (UTC everywhere),
          // matching DuckDB's epoch_us/epoch_ns on the same file.
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported dtype $other — expected long nanos or timestamp")
      }
    } else if (name == "embeddings") {
      // The ANN/cosine kernels and every DuckDB oracle assume float32
      // vectors. Tolerate a driver fixture regeneration that widens the
      // list element to double (the r7 events.ts lesson: tolerate known
      // drift in the loader, detect unknown drift in FixtureContractSpec)
      // by casting back down — float64 fixtures would have been produced
      // from the same float32 values, so the down-cast is lossless.
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => raw
        case ArrayType(DoubleType, _) =>
          raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
        case other =>
          throw new IllegalStateException(
            s"embeddings.embedding has unsupported dtype $other — expected array<float|double>")
      }
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

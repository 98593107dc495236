package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format breadth: csv and json round-trips with explicit
  * schemas (at 100 TB these are ingest formats — parquet remains the
  * at-rest format; see Tables/Snapshots). */
class FormatsSpec extends SparkSpec {

  private lazy val base = Tables.customer(spark, sf0001)
    .select(col("c_custkey"), col("c_name"), col("c_acctbal")).cache()

  test("csv round-trip with header + explicit schema") {
    val dir = Files.createTempDirectory("csv").toString + "/c"
    base.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(base.schema).csv(dir)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("json lines round-trip") {
    val dir = Files.createTempDirectory("json").toString + "/c"
    base.write.mode("overwrite").json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
  }

  test("Tables.events reads both fixture layouts: int64-nanos and timestamp[us]") {
    // The driver owns /root/testdata and has shipped events.ts in two
    // layouts (TIMESTAMP(NANOS)→long with nanosAsLong, and
    // timestamp[us]→TIMESTAMP_NTZ). Round-trip both through the loader
    // and require the identical (ts_ns, ts) contract.
    import spark.implicits._
    val micros = Seq(1700000000000000L, 1700000123456789L, 1700009876543210L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 100L + i, "click", 1.5 + i, "{}")
    }

    // layout A: ts as int64 nanos (what nanosAsLong surfaces for NANOS files)
    val dirA = Files.createTempDirectory("evA").toString
    rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // layout B: ts as timestamp_ntz micros (the current driver layout)
    val dirB = Files.createTempDirectory("evB").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    for (dir <- Seq(dirA, dirB)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType.typeName == "timestamp", dir)
      assert(ev.schema("ts_ns").dataType.typeName == "long", dir)
      val got = ev.orderBy("event_id")
        .select(col("ts_ns"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toSeq
      assert(got == micros.map(us => (us * 1000L, us)), s"layout at $dir")
    }
  }

  test("Tables.embeddings normalizes float AND double fixtures to array<float>") {
    // Same drift class as events.ts: the driver could regenerate
    // embeddings.parquet with float64 lists; the kernels assume float32.
    import spark.implicits._
    val vecs = Seq((0L, Seq(0.25f, -1.5f, 3.0f), 1), (1L, Seq(0.5f, 2.0f, -0.125f), 2))
    val dirF = Files.createTempDirectory("embF").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirF/embeddings.parquet")
    val dirD = Files.createTempDirectory("embD").toString
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")
    for (dir <- Seq(dirF, dirD)) {
      val emb = Tables.embeddings(spark, dir)
      assert(emb.schema("embedding").dataType.simpleString == "array<float>", dir)
      val got = emb.orderBy("vec_id").select(col("embedding"))
        .as[Seq[Float]].collect().toSeq
      assert(got == vecs.map(_._2), s"layout at $dir")
    }
  }

  test("orc round-trip with predicate pushdown in the plan") {
    val dir = Files.createTempDirectory("orc").toString + "/c"
    base.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      base.orderBy("c_custkey").collect().toSeq)
    val plan = back.filter(col("c_acctbal") > 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"),
      s"orc scan did not push the filter:\n$plan")
  }
}

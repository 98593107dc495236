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

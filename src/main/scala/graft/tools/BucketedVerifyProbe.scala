package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r11 probe (VERDICT r10 "Next round" #1): A/B the prefix-join
  * family's verify stage — the r10 double shuffle-hash join (wide
  * pair×array intermediate re-shuffles once, the residual 1.18 local
  * exponent at 10→100×) vs the bucketed verify
  * (`verifyBuckets` > 0: pair rows stay narrow through every
  * exchange; doc arrays ship to each home bucket at most once).
  *
  * Usage:
  *   SPARK_GRAFT_SCALE_FACTOR=100 SPARK_GRAFT_VERIFY_BUCKETS=256 \
  *     runMain graft.tools.BucketedVerifyProbe [joins|bucketed|both]
  */
object BucketedVerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUCKETS", "256").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val legs = args.headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-bucketed-verify-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("bv-probe").toString
    // the planted leg needs no amplified staging — branch first
    lazy val docs = {
      val docsBase = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      ScaleCorpus.amplifyDocs(docsBase, factor)
        .write.mode("overwrite").parquet(s"$root/docs")
      val d = spark.read.parquet(s"$root/docs")
      println(s"[probe] factor=$factor docs=${d.count()} buckets=$buckets")
      d
    }

    // shuffle-byte telemetry: wall time on local[32] is CPU/disk-bound
    // and cannot see what a 1000-executor cluster pays for — NETWORK
    // bytes through the exchanges. Both numbers print per rep.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // two passes per leg, both printed: pass 1 carries JVM/codegen
    // warmup (the r10 71.9 s vs 14.5 s first-leg artifact), pass 2 is
    // the comparable number; adjudicate on pass 2 + loadavg
    def time(label: String)(df: => DataFrame): Unit =
      for (rep <- 1 to 2) {
        val s0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        Thread.sleep(30)
        val gb = (shuffleBytes.get() - s0) / 1073741824.0
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        println(f"[probe] $label%-26s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s shuffle=$gb%.2f GiB load=$load%.1f")
      }

    if (legs == "planted") {
      // the HOT-DOC regime: the uniform corpus above measured the
      // bucketed path WORSE on both wall time and shuffle bytes
      // (pairs(doc) ≈ 1 — delivery dedup saves nothing, and doc
      // arrays cross TWO exchanges). The win condition is
      // pairs(doc) ≫ 2·buckets: giant near-dup clusters (boilerplate/
      // template pages at web scale). Plant C clusters of S mutual
      // near-dups: join plan attaches 2·pairs ≈ 2·C·S²/2 array
      // copies; bucketed ships ≤ 2·C·S·buckets.
      // FILLER unique docs push shh past the broadcast threshold (the
      // first planted run's 4000-doc shh broadcast, so the join plan
      // had NO pair exchange to save) — the bucketed win regime needs
      // no-broadcast AND hot docs simultaneously
      val C = 2; val S = 2000 // pairs(doc) ≈ 1999 ≫ 2·256
      val filler = sys.env.getOrElse("SPARK_GRAFT_PROBE_FILLER", "0").toInt
      import spark.implicits._
      val planted = ((0 until C).flatMap { c =>
        val prefix = (1 to 40).map(w => s"w${w}c$c").mkString(" ")
        (0 until S).map { j =>
          val id = (c * S + j).toLong
          (id, s"$prefix u$id")
        }
      } ++ (0 until filler).map { j =>
        val id = (C * S + j).toLong
        (id, (1 to 40).map(w => s"f${id}x$w").mkString(" "))
      }).toDF("doc_id", "text")
      planted.write.mode("overwrite").parquet(s"$root/planted")
      val pdocs = spark.read.parquet(s"$root/planted")
      println(s"[probe] planted C=$C S=$S docs=${pdocs.count()}")
      time("planted_join_verify")(
        Dedup.prefixFilterJoin(pdocs, "doc_id", "text", 3, 0.5))
      time("planted_bucketed")(
        Dedup.prefixFilterJoin(pdocs, "doc_id", "text", 3, 0.5,
          verifyBuckets = buckets))
      spark.stop()
      return
    }
    if (legs == "joins" || legs == "both") {
      time("q132_join_verify")(
        Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5))
      time("q150_join_verify")(
        Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.8))
    }
    if (legs == "bucketed" || legs == "both") {
      time("q132_bucketed")(
        Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5,
          verifyBuckets = buckets))
      time("q150_bucketed")(
        Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.8,
          verifyBuckets = buckets))
    }
    spark.stop()
  }
}

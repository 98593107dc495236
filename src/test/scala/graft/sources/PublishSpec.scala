package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The r15 q90 bench flake, pinned (VERDICT r15 #1): replay dumps
  * wrote FIXED paths with `mode("overwrite")` while session-memoized /
  * cached frames held lineage over those paths — an overwrite deletes
  * part files a re-executed cached plan still references →
  * `FAILED_READ_FILE.FILE_NOT_EXIST`. [[Snapshots.publish]] is the
  * make-equal replacement: identical content NEVER touches the
  * destination (live readers survive a republish), changed content is
  * swapped in atomically, and creation is temp-write + rename. */
class PublishSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def partFiles(dir: String): Set[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("part-")).toSet
  }

  test("republish of identical content keeps a live reader's lineage " +
      "valid (the q90 flake shape: old behavior deleted its part files)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pub").toString
    val dest = s"$root/artifact.parquet"
    val mk = () => Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)

    assert(Snapshots.publish(mk(), dest) == "created")
    // a memoized reader: plan + cache pinned over the published files
    val reader = spark.read.parquet(dest).cache()
    assert(reader.count() == 2)
    val before = partFiles(dest)

    // second driver / cold memo in a new session republishes the same
    // deterministic bytes — with mode("overwrite") this deleted `before`
    assert(Snapshots.publish(mk(), dest) == "kept")
    assert(partFiles(dest) == before,
      "identical-content republish must not touch existing part files")
    reader.unpersist() // force the cached plan to re-read from disk
    assert(spark.read.parquet(dest).count() == 2)
    assert(reader.collect().length == 2,
      "reader lineage must survive a republish")
  }

  test("changed content is replaced atomically and read back") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pub").toString
    val dest = s"$root/artifact.parquet"
    assert(Snapshots.publish(
      Seq((1L, "old")).toDF("id", "s").coalesce(1), dest) == "created")
    assert(Snapshots.publish(
      Seq((1L, "new"), (2L, "x")).toDF("id", "s").coalesce(1), dest)
      == "replaced")
    val back = spark.read.parquet(dest).orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("new", "x"))
    // no temp/old debris left beside the destination
    val siblings = fs.listStatus(new Path(root)).map(_.getPath.getName)
    assert(siblings.toSeq == Seq("artifact.parquet"),
      s"stray staging dirs: ${siblings.mkString(",")}")
  }

  test("an unreadable destination (half-written dir from a killed " +
      "pre-publish run) is replaced, not fatal") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pub").toString
    val dest = s"$root/artifact.parquet"
    // simulate a killed mode("overwrite") run: a dir with a garbage
    // part file that no parquet reader can open
    fs.mkdirs(new Path(dest))
    val out = fs.create(new Path(dest, "part-00000-garbage.parquet"))
    out.write("not parquet".getBytes); out.close()
    assert(Snapshots.publish(
      Seq((1L, "v")).toDF("id", "s").coalesce(1), dest) == "replaced")
    assert(spark.read.parquet(dest).count() == 1)
  }

  test("session memo (r17): a repeat publish of the same producer plan " +
      "runs no jobs — and an externally deleted destination self-heals") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pub").toString
    val dest = s"$root/artifact.parquet"
    val mk = () => Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
    assert(Snapshots.publish(mk(), dest) == "created")
    // memo hit: no temp dir is ever staged beside the destination (a
    // non-memoized "kept" stages + deletes one; zero staging proves
    // the repeat path ran no write/compare jobs at all)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(Snapshots.publish(mk(), dest) == "kept")
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      assert(jobs.get() == 0,
        s"memoized repeat publish ran ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // self-heal: an externally deleted artifact must republish, not
    // serve a stale memoized "kept"
    fs.delete(new Path(dest), true)
    assert(Snapshots.publish(mk(), dest) == "created")
    assert(spark.read.parquet(dest).count() == 2)
  }

  test("content compare is order-independent (a repartitioned republish " +
      "of the same rows is 'kept', not a spurious replace)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pub").toString
    val dest = s"$root/artifact.parquet"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    assert(Snapshots.publish(df.coalesce(1), dest) == "created")
    assert(Snapshots.publish(
      df.orderBy(org.apache.spark.sql.functions.col("id").desc)
        .repartition(3), dest) == "kept")
  }
}

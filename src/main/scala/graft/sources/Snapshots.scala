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
    * and return the persisted copy (so downstream reads columnar).
    * The create leg is atomic (r16, ADVICE r15 #5): the computed frame
    * lands in a unique temp sibling and is RENAMED into place, so a
    * concurrent reader can never observe a half-written snapshot and
    * two concurrent creators race on the rename, not on part files —
    * the loser discards its temp (snapshot names are content keys over
    * deterministic computes, so either writer's bytes are valid). */
  def loadOrCreate(spark: SparkSession, baseDir: String,
      snapshotDate: String, name: String)(compute: => DataFrame): DataFrame = {
    val p = path(baseDir, snapshotDate, name)
    try spark.read.parquet(p)
    catch {
      case e: AnalysisException if e.getMessage.contains("does not exist") =>
        writeOnceAtomic(compute, p)
        spark.read.parquet(p)
    }
  }

  /** Temp-write + atomic rename into `dest`; never touches an existing
    * `dest`. Returns false when `dest` already exists or a concurrent
    * creator won the rename race (the temp is discarded either way). */
  private def writeOnceAtomic(df: DataFrame, dest: String): Boolean = {
    val spark = df.sparkSession
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(destPath.getParent,
      s".${destPath.getName}.tmp-${
        java.util.UUID.randomUUID().toString.take(12)}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val ok = renameIntoAbsent(fs, tmp, destPath)
    if (!ok) fs.delete(tmp, true)
    ok
  }

  /** Rename `tmp` onto an ABSENT `dest`, detecting the Hadoop
    * rename-into-existing-directory hazard (ADVICE r16 #4): when a
    * concurrent creator lands `dest` between the exists check and the
    * rename, `FileSystem.rename` moves `tmp` INSIDE `dest` and still
    * returns true — the caller would report "created" while `dest`
    * serves the other writer's bytes with an orphaned hidden subdir
    * inside it. After a successful rename this verifies
    * `dest/<tmp-name>` does not exist; if it does, the stray subdir is
    * deleted and the call reports a lost race (false) — `dest` keeps
    * serving the concurrent winner's bytes, now without the orphan. */
  private def renameIntoAbsent(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path): Boolean = {
    val renamed =
      try !fs.exists(dest) && fs.rename(tmp, dest)
      catch { case _: java.io.IOException => false }
    renamed && {
      val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
      !fs.exists(nested) || { fs.delete(nested, true); false }
    }
  }

  /** Order-independent content signature (row count + decimal sum of
    * full-row xxhash64 — full-range 64-bit hashes overflow a Long sum
    * after a handful of rows, hence decimal(38,0)). */
  private def contentSig(df: DataFrame): (Long, String) = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
    val r = df.agg(count(lit(1)),
      sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
  }

  /** Atomic replay-artifact publisher for FIXED destination paths
    * (r16, VERDICT r15 #1 — the q90 bench flake).
    *
    * The r15 failure mode: replay dumps wrote fixed paths with
    * `mode("overwrite")` while session-memoized/cached frames held
    * lineage over those same paths — an overwrite (a concurrent
    * driver, or a cold memo in a new session) deletes part files a
    * re-executed cached plan still references →
    * `FAILED_READ_FILE.FILE_NOT_EXIST` mid-bench. Fixed paths are a
    * hard requirement here (the DuckDB oracle SQL embeds them), so
    * content-keyed NAMES (the AnnIndexSnapshot discipline) don't fit;
    * instead the path is fixed and the write is make-equal:
    *
    *  - dest absent → temp write + atomic rename ("created");
    *  - dest holds IDENTICAL content (order-independent count +
    *    xxhash64-sum compare of the bytes on disk) → dest is NOT
    *    touched, the temp is dropped ("kept") — the steady-state
    *    path: every live reader's lineage survives, concurrent
    *    same-version drivers cannot delete each other's part files;
    *  - dest holds DIFFERENT content (an artifact from an older
    *    engine version) → atomic swap: dest renamed aside, temp
    *    renamed in, old bytes dropped ("replaced"). Two different
    *    ENGINE VERSIONS racing over one artifact dir is outside the
    *    contract (same carve-out as the repo's other memos); within
    *    one version "replaced" can only fire on the first publish of
    *    a session, before any reader memoized the path.
    *
    * Precondition: `df` is deterministic for the engine version (every
    * replay dump is seed-deterministic), so rename-race losers and
    * "kept" callers can safely serve the existing bytes.
    *
    * Repeat-publish cost (r17, VERDICT r16 "What's wrong" #3): the
    * make-equal content compare is O(artifact) per call, and a bench
    * pass re-invokes every dump gate — q25b paid the ALS factor-dump
    * compare on every pass. The full publish now runs ONCE per
    * (session, dest, producer plan, resolved input files): the same
    * deterministic producer republishing in the same session is a
    * session-memo hit plus one exists() metadata call (self-healing:
    * an externally deleted destination republishes instead of serving
    * a stale "kept"). A DIFFERENT producer plan — different content —
    * misses the memo and takes the full compare path, so PublishSpec's
    * changed-content semantics are untouched. */
  def publish(df: DataFrame, dest: String): String = {
    val spark = df.sparkSession
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val memoKey = "publish:" + dest + ":" +
      df.queryExecution.analyzed.semanticHash() + ":" +
      graft.ops.PlanFingerprint.inputFingerprint(df)
    // the memo slot (not the status) is session-cached, so a hit is
    // distinguishable from a first publish: a repeat is "kept" — the
    // artifact already equals what this producer writes
    val slot = graft.ml.ModelMemo.cached(spark, memoKey)(
      new java.util.concurrent.atomic.AtomicReference[String](null))
    if (slot.get() != null && fs.exists(destPath)) "kept"
    else {
      val status = publishOnce(df, destPath, fs)
      slot.set(status)
      status
    }
  }

  private def publishOnce(df: DataFrame,
      destPath: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem): String = {
    val spark = df.sparkSession
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val tmp = new org.apache.hadoop.fs.Path(destPath.getParent,
      s".${destPath.getName}.tmp-$tag")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (renameIntoAbsent(fs, tmp, destPath)) "created"
    else {
      // content compares run ONLY on the not-created path (ADVICE r16
      // #2: the cold create used to pay a full-scan signature job whose
      // result was discarded). An UNREADABLE existing dest (a
      // half-written dir from a killed pre-r16 overwrite run —
      // post-r16 creations are rename-atomic and can't be
      // half-written) is replaceable, not fatal: without this, one
      // stale corrupt artifact would wedge every future publish.
      val destSig =
        try Some(contentSig(spark.read.parquet(destPath.toString)))
        catch { case scala.util.control.NonFatal(_) => None }
      if (destSig.contains(contentSig(spark.read.parquet(tmp.toString)))) {
        fs.delete(tmp, true)
        "kept"
      } else {
        val old = new org.apache.hadoop.fs.Path(destPath.getParent,
          s".${destPath.getName}.old-$tag")
        fs.rename(destPath, old)
        if (renameIntoAbsent(fs, tmp, destPath)) {
          // the new dest is confirmed in place — only now may the old
          // bytes be retired (ADVICE r16 #1: deleting `old` before the
          // swap is confirmed can leave dest missing entirely)
          fs.delete(old, true)
          "replaced"
        } else {
          // swap lost: a concurrent creator landed dest between the
          // two renames (their bytes are valid — serve them), or the
          // rename failed outright (dest absent — RESTORE the renamed-
          // aside artifact, the only surviving copy). If the restore
          // itself loses a last-instant race (dest appears between our
          // exists check and the rename), the winner's bytes serve and
          // `old` is retired rather than left as debris.
          fs.delete(tmp, true)
          if (fs.exists(destPath)) fs.delete(old, true)
          else if (!fs.rename(old, destPath) && fs.exists(destPath))
            fs.delete(old, true)
          "kept"
        }
      }
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

package graft.ops

import org.apache.spark.sql.DataFrame

/** Cheap input-identity fingerprint for plan-keyed session memos
  * (ADVICE r14 #1): a 32-bit `semanticHash` alone can alias two
  * distinct plans, and an input DIRECTORY rewritten behind an
  * identical plan keeps the same hash while the bytes change. Folding
  * the scan's resolved file list into the memo key closes both holes
  * for file-backed inputs: a parquet overwrite produces new part-file
  * names (fresh task UUIDs), so the fingerprint moves even when the
  * path and schema do not.
  *
  * Metadata-only: `DataFrame.inputFiles` reads the already-resolved
  * FileIndex (no data scan, no extra listing for parquet reads the
  * plan has already planned). Non-file inputs (local relations,
  * in-memory test frames) fingerprint as their file COUNT (0) — for
  * those the semantic hash remains the only key component, which is
  * exactly the pre-r15 contract, now confined to inputs that have no
  * files to rewrite. */
object PlanFingerprint {

  /** MD5 hex of the sorted resolved input-file paths ("nofiles" when
    * the plan reads no files). */
  def inputFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) "nofiles"
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      files.sorted.foreach { f =>
        md.update(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.update('\n'.toByte)
      }
      md.digest().map("%02x".format(_)).mkString
    }
  }
}

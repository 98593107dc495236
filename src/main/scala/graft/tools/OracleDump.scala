package graft.tools

/** Dev utility: write oracle_sql.json for selected gates (all when no
  * names given) so tools/check.py can compare a DumpOne output dir
  * without running the full Verify sweep.
  * Usage: runMain graft.tools.OracleDump <outDir> [<name>...]
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSet
    val entries = graft.SparkEntry.oracleSql
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    val json = entries.toSeq.sortBy(_._1).map { case (n, sql) =>
      s"${graft.JsonUtil.quote(n)}: ${graft.JsonUtil.quote(sql)}"
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[oracle] wrote ${entries.size} entries to $outDir/oracle_sql.json")
  }
}

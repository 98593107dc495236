package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: gate names unique and well-formed,
  * every oracle attached to a real query, SQL non-empty, and the
  * SparkEntry maps in sync with the registry. */
class RegistrySpec extends AnyFunSuite {

  test("gate names are unique and well-formed") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate gates: ${names.diff(names.distinct)}")
    // qNN_name, with an optional variant letter (q54b = approx twin of q54)
    names.foreach(n => assert(n.matches("q\\d+[a-z]?_[a-z0-9_]+"), n))
  }

  test("every oracle belongs to a registered query and is non-empty") {
    val names = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(names.contains(k), s"oracle for unknown gate $k")
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }

  test("oracle SQL only references driver-provided tables or fixture parquet") {
    val tables = graft.sources.Tables.all.toSet
    // crude lexical check: FROM/JOIN targets are either known tables,
    // CTE names defined in the same SQL, or read_parquet of the
    // persisted fixtures
    val idRe = "(?i)(?:from|join)\\s+([a-z_][a-z0-9_]*)".r
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_,\\s]*\\))?\\s+as\\s+(?:materialized\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      idRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        val tableFns = Set("read_parquet", "lateral", "unnest", "range",
          "generate_series")
        assert(tables.contains(t) || ctes.contains(t) || tableFns.contains(t),
          s"$k references unknown relation '$t'")
      }
    }
  }

  test("registry and SparkEntry maps agree") {
    assert(SparkEntry.queries.size == SparkEntry.registry.size)
    assert(SparkEntry.registry.map(_.name).toSet == SparkEntry.queries.keySet)
  }
}

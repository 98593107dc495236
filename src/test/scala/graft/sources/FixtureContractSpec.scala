package graft.sources

import graft.SparkSpec

/** Schema contract over the driver-owned fixtures.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * dtypes before (r7: events.ts int64-nanos → timestamp[us], which
  * darkened 23 gates with errors that named neither the table nor the
  * cause). This spec pins the dtype every query layer assumes, per
  * table, so fixture drift fails HERE with a message naming the exact
  * column — one loud spec instead of a fleet of cryptic gate failures.
  *
  * `events.ts` is intentionally NOT pinned to a single layout: the
  * loader accepts both historical layouts (see Tables.events and the
  * FormatsSpec round-trip); this spec asserts the post-load CONTRACT
  * (ts timestamp, ts_ns long) instead of the file dtype.
  */
class FixtureContractSpec extends SparkSpec {

  private def loadedTypes(name: String): Map[String, String] =
    Tables(spark, sf0001, name).schema.fields
      .map(f => f.name -> f.dataType.typeName).toMap

  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "integer", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "integer", "n_name" -> "string",
      "n_regionkey" -> "integer"),
    "customer" -> Map("c_custkey" -> "long", "c_name" -> "string",
      "c_nationkey" -> "integer", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "long", "s_name" -> "string",
      "s_nationkey" -> "integer", "s_acctbal" -> "double"),
    "part" -> Map("p_partkey" -> "long", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integer",
      "p_retailprice" -> "double"),
    "orders" -> Map("o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "long", "l_partkey" -> "long",
      "l_suppkey" -> "long", "l_linenumber" -> "integer",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string"),
    "events" -> Map("event_id" -> "long", "user_id" -> "long",
      "event_type" -> "string", "value" -> "double", "props" -> "string",
      // post-load contract from Tables.events, layout-independent
      "ts" -> "timestamp", "ts_ns" -> "long"),
    "documents" -> Map("doc_id" -> "long", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "long"),
    "embeddings" -> Map("vec_id" -> "long", "label" -> "integer"))

  for ((table, cols) <- expected) {
    test(s"$table columns load with the dtypes the query layer assumes") {
      val got = loadedTypes(table)
      for ((c, t) <- cols)
        assert(got.get(c).contains(t),
          s"$table.$c: expected $t, loaded ${got.get(c)} — " +
            "driver fixture drift? See Tables.events for the dual-layout precedent")
    }
  }

  test("embeddings.embedding is an array of FloatType (ANN kernels assume 4-byte floats)") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val dt = Tables(spark, sf0001, "embeddings").schema("embedding").dataType
    assert(dt == ArrayType(FloatType, containsNull = true) ||
      dt == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding loaded as $dt — the cosine/LSH/IVF kernels " +
        "and their DuckDB oracles assume float32; a dtype change needs a " +
        "loader branch like Tables.events")
  }

  test("date columns used by the date-math oracles load as dates or timestamps") {
    // q13's datediff math and the DuckDB CAST(x AS DATE) oracles accept
    // either; anything else (string, long) silently changes semantics
    for ((t, c) <- Seq(("orders", "o_orderdate"), ("lineitem", "l_shipdate"))) {
      val dt = Tables(spark, sf0001, t).schema(c).dataType.typeName
      assert(dt == "timestamp" || dt == "timestamp_ntz" || dt == "date",
        s"$t.$c loaded as $dt")
    }
  }
}

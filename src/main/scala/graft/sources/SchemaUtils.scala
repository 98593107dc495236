package graft.sources

import org.apache.spark.sql.types._

/** Schema comparison ignoring nullability, recursive over
  * Array/Map/Struct. Reference: SchemaUtils.equalsIgnoreNullability
  * (reference: src/main/scala/ws/vinta/albedo/utils/SchemaUtils.scala:6-18,
  * duplicated at evaluators/RankingEvaluator.scala:58-70 — single copy
  * here). Used by transformer-style schema validation. */
object SchemaUtils {

  def equalsIgnoreNullability(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (ArrayType(ae, _), ArrayType(be, _)) =>
        equalsIgnoreNullability(ae, be)
      case (MapType(ak, av, _), MapType(bk, bv, _)) =>
        equalsIgnoreNullability(ak, bk) && equalsIgnoreNullability(av, bv)
      case (StructType(af), StructType(bf)) =>
        af.length == bf.length && af.zip(bf).forall { case (x, y) =>
          x.name == y.name && equalsIgnoreNullability(x.dataType, y.dataType)
        }
      case _ => a == b
    }

  /** Transformer-style input validation: column present with the
    * expected type (nullability-insensitive). Ref: the transformSchema
    * checks (Recommender.scala:46-56 etc.). */
  def requireColumn(schema: StructType, name: String, dt: DataType): Unit = {
    require(schema.fieldNames.contains(name), s"missing column: $name")
    val actual = schema(name).dataType
    require(equalsIgnoreNullability(actual, dt),
      s"column $name: expected $dt, got $actual")
  }
}

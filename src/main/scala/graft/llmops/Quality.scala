package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level quality gates for training-data pipelines: the
  * validation pass that runs BEFORE a corpus is admitted to training
  * (null rates, uniqueness, ranges), and vocabulary construction for
  * tokenizer builds.
  *
  * Scale design: the constraint report is ONE full-scan aggregation —
  * every per-column statistic is a conditional aggregate in the same
  * `agg(...)`, so 50 checks over 100 TB still cost a single pass, no
  * per-check jobs (the anti-pattern deequ-style frameworks avoid the
  * same way). Vocabulary build is one shuffle on token.
  */
object Quality {

  /** Declarative column constraint. */
  sealed trait Check { def name: String; def col: String }
  case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Check {
    val name = s"not_null:$col"
  }
  case class Unique(col: String) extends Check { val name = s"unique:$col" }
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$col"
  }
  case class NonEmpty(col: String) extends Check {
    val name = s"non_empty:$col"
  }

  /** One row per check: (check, column, violations, total, pass) —
    * computed in a single scan + one global aggregate. Uniqueness is
    * the one check that needs its own shuffle (count-distinct per
    * column); it shares the scan via the same cached input when the
    * caller caches. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val total = count(lit(1))
    val aggs: Seq[Column] = checks.flatMap {
      case NotNull(c, _) =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"))
      case InRange(c, lo, hi) =>
        Seq(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
          .as(s"ir_$c"))
      case NonEmpty(c) =>
        Seq(sum(when(length(trim(col(c))) === 0, 1L).otherwise(0L))
          .as(s"ne_$c"))
      case Unique(c) =>
        Seq((count(lit(1)) - countDistinct(col(c))).as(s"uq_$c"))
    }
    val one = df.agg(total.as("total"), aggs: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = checks.map {
      case NotNull(c, f) => (s"not_null:$c", c, s"nn_$c", f)
      case InRange(c, _, _) => (s"in_range:$c", c, s"ir_$c", 0.0)
      case NonEmpty(c) => (s"non_empty:$c", c, s"ne_$c", 0.0)
      case Unique(c) => (s"unique:$c", c, s"uq_$c", 0.0)
    }.toDF("check", "column", "key", "max_frac")
    // one agg row × small check table: broadcast the agg row via
    // crossJoin (1×N, no shuffle), then pick each check's counter with
    // a CASE over the bounded key set
    val counters = checks.map {
      case NotNull(c, _) => s"nn_$c"; case InRange(c, _, _) => s"ir_$c"
      case NonEmpty(c) => s"ne_$c"; case Unique(c) => s"uq_$c"
    }.distinct
    val caseExpr = counters.foldLeft(lit(null).cast("long")) { (acc, k) =>
      when(col("key") === k, col(k)).otherwise(acc)
    }
    rows.crossJoin(broadcast(one))
      .withColumn("violations", caseExpr)
      .withColumn("pass",
        col("violations") <= col("max_frac") * col("total"))
      .select(col("check"), col("column"), col("violations"),
        col("total"), col("pass"))
  }

  /** Tokenizer vocabulary: top `vocabSize` tokens by document
    * frequency with STABLE ids (freq desc, token asc — deterministic
    * across runs and engines). One shuffle on token, then a
    * TakeOrdered limit (per-partition top-k, no global sort of the
    * full distinct-token set); the row_number window runs only over
    * the already-bounded vocabSize rows. */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      minDf: Int = 1): DataFrame = {
    val toks = docs
      .select(explode(array_distinct(split(trim(lower(col(textCol))), "\\s+")))
        .as("token"))
      .filter(col("token") =!= "")
    val byFreq = Window.orderBy(col("df").desc, col("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("token"))
      .limit(vocabSize)
      .withColumn("token_id", row_number().over(byFreq).cast("long") - 1)
  }
}

package graft

import graft.expressions.StringArrayExpressions._
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** ArrayCountIn: the codegen'd membership-count kernel must be
  * value-identical to the interpreted `size(filter(toks, isin(...)))`
  * form it replaces in the t04/t05/c01 scoring paths. */
class StringArrayExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("arrayCountIn matches the interpreted filter+isin form on real docs") {
    val docs = graft.sources.Tables.documents(spark, sfTiny).limit(200)
    val toks = TextFunctions.tokens(col("text"))
    val raw = split(TextFunctions.cleanText(col("text")), " ")
    val stop = TextFunctions.stopWords
    val markers = Seq("the", "a", "and", "of", "is")
    val mismatches = docs.select(
      size(toks).as("n_ref"),
      arrayCountNotIn(raw, Seq("")).as("n_new"),
      size(filter(toks, t => t.isin(stop: _*))).as("s_ref"),
      arrayCountIn(raw, stop).as("s_new"),
      size(filter(toks, t => t.isin(markers: _*))).as("m_ref"),
      arrayCountIn(raw, markers).as("m_new"))
      .filter(col("n_ref") =!= col("n_new") ||
        col("s_ref") =!= col("s_new") || col("m_ref") =!= col("m_new"))
      .count()
    assert(mismatches === 0L)
  }

  test("arrayCountIn edge cases: empty array, nulls, duplicates, null array") {
    val df = Seq(
      (1, Seq[String]()),
      (2, Seq("a", "b", "a", "a")),
      (3, Seq("", "a", "")),
      (4, null: Seq[String])
    ).toDF("id", "xs")
    val out = df.select(col("id"),
      arrayCountIn(col("xs"), Seq("a")).as("in_a"),
      arrayCountNotIn(col("xs"), Seq("")).as("non_empty"),
      // null elements count as "not in the set" on both polarities
      arrayCountIn(when(col("id") === 2, array(lit("a"), lit(null), lit("b")))
        .otherwise(col("xs")), Seq("a")).as("with_null"))
      .orderBy(col("id")).collect()
    assert(out(0).getInt(1) === 0 && out(0).getInt(2) === 0)
    assert(out(1).getInt(1) === 3 && out(1).getInt(2) === 4 &&
      out(1).getInt(3) === 1)
    assert(out(2).getInt(1) === 1 && out(2).getInt(2) === 1)
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("interpreted path (codegen fallback) agrees with compiled path") {
    // nullSafeEval is the non-codegen fallback — exercise it directly
    val e = graft.expressions.ArrayCountIn(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("x", "y", "x", null, ""),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      Seq("x", ""))
    assert(e.eval(null) === 3)
    assert(e.copy(negate = true).eval(null) === 1) // only "y"; null not counted
  }
}

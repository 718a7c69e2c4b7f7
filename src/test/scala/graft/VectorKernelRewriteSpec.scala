package graft

import graft.expressions.ArrayDot
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The VectorKernelRewrite optimizer rule: declarative
  * aggregate/zip_with vector math must plan as the codegen'd ArrayDot
  * kernel (and keep identical results/null semantics). */
class VectorKernelRewriteSpec extends SparkSpec {

  private def usesKernel(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[ArrayDot]))

  // repartition blocks ConvertToLocalRelation from eagerly evaluating
  // the projection at optimize time (which would hide the rewrite)
  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.5, -1.0, 2.0), Seq(1.0, 1.0, 1.0))
    ).toDF("id", "a", "b").repartition(1)
  }

  test("dot via aggregate(zip_with) is planned as ArrayDot") {
    val q = vecs.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
    assert(usesKernel(q))
    assert(rows(q.orderBy(col("d"))) === Seq(Seq(1.5), Seq(32.0)))
  }

  test("l2Norm's inner aggregate is planned as ArrayDot(a, a)") {
    val q = vecs.select(round(VectorFunctions.l2Norm(col("a")), 6).as("n"))
    assert(usesKernel(q))
    assert(rows(q) === Seq(Seq(rnd(math.sqrt(14.0), 6)), Seq(rnd(math.sqrt(5.25), 6))))
  }

  private def rnd(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cosine plans entirely on kernels and matches the explicit form") {
    val q = vecs.select(col("id"),
      round(VectorFunctions.cosine(col("a"), col("b")), 6).as("c"))
    assert(usesKernel(q))
    val explicitQ = vecs.select(col("id"),
      round(graft.expressions.VectorExpressions.fastCosine(col("a"), col("b")), 6).as("c"))
    assert(rows(q.orderBy(col("id"))) === rows(explicitQ.orderBy(col("id"))))
  }

  test("nullable-element arrays are NOT rewritten (parity guard)") {
    import spark.implicits._
    val nullable = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(2.0), Some(3.0))))
      .toDF("id", "a", "b").repartition(1)
    val q = nullable.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!usesKernel(q))
    assert(rows(q) === Seq(Seq(null))) // null element poisons the fold
  }

  test("length mismatch still yields null after the rewrite") {
    import spark.implicits._
    val ragged = Seq((1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("id", "a", "b").repartition(1)
    val q = ragged.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
    assert(usesKernel(q))
    assert(rows(q) === Seq(Seq(null)))
  }
}

package graft.plans

import graft.expressions.ArrayDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: rewrite the declarative higher-order-function
  * formulation of a dot product / squared norm into the codegen'd
  * [[graft.expressions.ArrayDot]] kernel.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` is the
  * natural way to write a dot product in the public DataFrame API — and
  * it evaluates interpreted, once per element, outside whole-stage
  * codegen (higher-order functions don't participate). In an all-pairs
  * similarity join that interpreter overhead dominates the query. The
  * kernel computes the identical sequential double sum (bit-equal
  * results, same null-on-length-mismatch), so users can write the
  * declarative form and the planner supplies the tight loop — the same
  * contract Catalyst itself applies when it collapses other expression
  * patterns.
  *
  * Matched shapes (after analysis):
  *  - ArrayAggregate(ZipWith(a, b, (x,y) -> dc(x) * dc(y)), 0.0,
  *    (acc,v) -> acc + v, identity)              → ArrayDot(a, b)
  *  - ArrayAggregate(ArrayTransform(a, x -> dc(x) * dc(x)), 0.0,
  *    (acc,v) -> acc + v, identity)              → ArrayDot(a, a)
  *    (callers wrap in sqrt for the L2 norm — the sqrt stays put)
  * where dc is an optional cast-to-double and the element types are
  * FLOAT/DOUBLE with containsNull = false (a null element makes the
  * interpreted fold return null; the kernel reads primitive arrays, so
  * nullable-element inputs are left in interpreted form for parity).
  */
object VectorKernelRewrite extends Rule[LogicalPlan] {

  /** e is the lambda variable v, possibly under a cast to double. */
  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case _ => false
  }

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** (acc, v) -> acc + v */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && r.exprId == v.exprId
    case _ => false
  }

  /** acc -> acc (the implicit identity finish). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** Kernel-compatible array: float/double elements, no element nulls. */
  private def kernelArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dot(a, b)
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero, merge, finish)
          if isZeroLit(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
            kernelArray(a) && kernelArray(b) &&
            ((sameVar(mx, x) && sameVar(my, y)) ||
              (sameVar(mx, y) && sameVar(my, x))) =>
        ArrayDot(a, b)
      // Σ aᵢ² (norm² — callers keep the sqrt outside)
      case ArrayAggregate(
            ArrayTransform(a,
              LambdaFunction(Multiply(m1, m2, _),
                Seq(x: NamedLambdaVariable), _)),
            zero, merge, finish)
          if isZeroLit(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
            kernelArray(a) && sameVar(m1, x) && sameVar(m2, x) =>
        ArrayDot(a, a)
    }
}

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * [[graft.Sessions.configure]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => VectorKernelRewrite)
}

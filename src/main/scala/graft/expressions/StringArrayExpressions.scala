package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd set-membership count over ARRAY<STRING>.
  *
  * The quality/language scoring heuristics (t04/t05, and through them the
  * c01 corpus gate — the hottest 100 TB path) need "how many tokens of
  * this document are in this static word list". The higher-order
  * `size(filter(toks, t.isin(w1..wN)))` form is interpreted (lambda
  * functions don't participate in whole-stage codegen) AND evaluates an
  * O(N)-literal `isin` chain per token — O(tokens × |list|) interpreted
  * work per document. This expression compiles to a tight loop probing a
  * shared java.util.HashSet of UTF8Strings: O(tokens) with O(1) probes,
  * inside whole-stage codegen.
  *
  * `negate = true` counts elements NOT in the set — `countIn(raw, [""],
  * negate)` is the non-empty token count, replacing the tokenizer's own
  * interpreted empty-filter in counting-only paths.
  *
  * Null elements count as "not in the set" (and are not counted under
  * `negate` either): the interpreted `isin` yields null for a null
  * element, which `filter` treats as false — and under `negate` the
  * oracle's `x <> ''` is also null-valued, so both engines drop nulls.
  */
case class ArrayCountIn(child: Expression, members: Seq[String],
                        negate: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_in"

  @transient private lazy val memberSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](members.size * 2)
    members.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          memberSet.contains(arr.getUTF8String(i)) != negate) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("memberSet", memberSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) &&
         |      $setRef.contains($a.getUTF8String($i)) != $negate) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StringArrayExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Count of array elements that ARE in `members` (codegen'd). */
  def arrayCountIn(a: Column, members: Seq[String]): Column =
    column(ArrayCountIn(expression(a), members))

  /** Count of array elements that are NOT in `members` (codegen'd). */
  def arrayCountNotIn(a: Column, members: Seq[String]): Column =
    column(ArrayCountIn(expression(a), members, negate = true))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels over ARRAY<FLOAT>/ARRAY<DOUBLE>.
  *
  * The generic `aggregate(zip_with(...))` formulation of a dot product is
  * interpreted per element (higher-order functions don't participate in
  * whole-stage codegen), which dominates all-pairs similarity joins. These
  * expressions compile to a tight primitive loop instead — semantics are
  * identical (cast element to double, multiply, sequential left-to-right
  * sum) so results are bit-equal to the interpreted form and to the
  * sequential DuckDB oracle.
  */
private object VecGen {
  /** Per-element getter for the supported array element types. */
  def getter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  def toDoubles(dt: DataType, a: Any): Array[Double] =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => a.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
      case DoubleType => a.asInstanceOf[ArrayData].toDoubleArray()
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }
}

/** Σ aᵢ·bᵢ with doubles, sequential order. Null on length mismatch —
  * matching the interpreted `aggregate(zip_with(...))` form (zip_with
  * pads the shorter side with nulls, poisoning the sum to null), so the
  * documented bit-equality holds for ragged inputs too. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = VecGen.toDoubles(left.dataType, a)
    val y = VecGen.toDoubles(right.dataType, b)
    if (x.length != y.length) return null
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ax = VecGen.getter(left.dataType, a, i)
      val bx = VecGen.getter(right.dataType, b, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double ${ev.value}_s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value}_s += ($ax) * ($bx);
         |  }
         |  ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ‖a‖₂ = sqrt(Σ aᵢ²), sequential order. */
case class ArrayNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = {
    val x = VecGen.toDoubles(child.dataType, a)
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ax = VecGen.getter(child.dataType, a, i)
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}_s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double ${ev.value}_x = $ax;
         |  ${ev.value}_s += ${ev.value}_x * ${ev.value}_x;
         |}
         |${ev.value} = java.lang.Math.sqrt(${ev.value}_s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** max |aᵢ| — the symmetric-quantization range probe (0.0 for an empty
  * array: nothing to represent ⇒ zero range). */
case class ArrayMaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = {
    val x = VecGen.toDoubles(child.dataType, a)
    var m = 0.0
    var i = 0
    while (i < x.length) { val v = math.abs(x(i)); if (v > m) m = v; i += 1 }
    m
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ax = VecGen.getter(child.dataType, a, i)
      s"""
         |int $n = $a.numElements();
         |double ${ev.value}_m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double ${ev.value}_v = java.lang.Math.abs($ax);
         |  if (${ev.value}_v > ${ev.value}_m) ${ev.value}_m = ${ev.value}_v;
         |}
         |${ev.value} = ${ev.value}_m;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** max reconstruction error of symmetric scalar quantization at a given
  * step: maxᵢ |rint(aᵢ/scale)·scale − aᵢ| (rint = round-half-even, the
  * standard quantizer). Null when scale ≤ 0 — the caller decides what a
  * degenerate (all-zero) vector means. One fused pass: quantize,
  * dequantize, and track the error without materializing the int8
  * array — the verification shape; a storage pipeline would emit the
  * quantized array itself from the same loop. */
case class ArrayQuantError(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, s: Any): Any = {
    val scale = s.asInstanceOf[Double]
    if (scale <= 0.0) return null
    val x = VecGen.toDoubles(left.dataType, a)
    var m = 0.0
    var i = 0
    while (i < x.length) {
      val e = math.abs(math.rint(x(i) / scale) * scale - x(i))
      if (e > m) m = e
      i += 1
    }
    m
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ax = VecGen.getter(left.dataType, a, i)
      s"""
         |if ($s <= 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double ${ev.value}_m = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double ${ev.value}_x = $ax;
         |    double ${ev.value}_e = java.lang.Math.abs(
         |      java.lang.Math.rint(${ev.value}_x / $s) * $s - ${ev.value}_x);
         |    if (${ev.value}_e > ${ev.value}_m) ${ev.value}_m = ${ev.value}_e;
         |  }
         |  ${ev.value} = ${ev.value}_m;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Count of positions where two ARRAY<BIGINT> columns agree — the
  * MinHash signature-agreement kernel (d14). Bit-equal to the
  * interpreted `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otw(0)),
  * 0, _+_)` form: zip_with pads the shorter side with nulls and the
  * `when` then contributes 0, so both forms count equality over the
  * overlapping prefix; higher-order functions don't participate in
  * whole-stage codegen, this does. */
case class ArrayLongEqCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int ${ev.value}_c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}_c++;
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def arrayLongEqCount(a: Column, b: Column): Column =
    column(ArrayLongEqCount(expression(a), expression(b)))

  def arrayDot(a: Column, b: Column): Column =
    column(ArrayDot(expression(a), expression(b)))
  def arrayNorm(a: Column): Column = column(ArrayNorm(expression(a)))
  def arrayMaxAbs(a: Column): Column = column(ArrayMaxAbs(expression(a)))
  def arrayQuantError(a: Column, scale: Column): Column =
    column(ArrayQuantError(expression(a), expression(scale)))
  /** cos(a,b) with the same arithmetic as the interpreted/oracle form.
    * A zero vector yields null (nullif guard) instead of an ANSI-mode
    * DIVIDE_BY_ZERO crash — degenerate rows then drop out of any
    * similarity-threshold filter, matching the oracle's NaN behavior. */
  def fastCosine(a: Column, b: Column): Column =
    arrayDot(a, b) / org.apache.spark.sql.functions.nullif(
      arrayNorm(a) * arrayNorm(b), org.apache.spark.sql.functions.lit(0.0))
}

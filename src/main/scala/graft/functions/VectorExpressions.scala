package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array and evaluates two lambda closures per
  * element; on the quadratic stages of similarity search (every
  * query×corpus / pair×pair score) that is the dominant cost. This
  * expression emits a tight fused multiply-add loop through whole-stage
  * codegen instead — same sequential fold order, bit-identical result,
  * so the DuckDB oracle comparisons are unaffected.
  *
  * Accepts array<float> or array<double> on either side (floats widen to
  * double per element, exactly like the HOF form's explicit casts).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // a null ELEMENT nulls the whole dot (exactly like the HOF
  // aggregate(zip_with(...)) formulation, where null * x poisons the
  // fold) — so the expression is nullable whenever an input array may
  // hold null elements, not only when the arrays themselves are nullable
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val checkL = elemNullable(left)
    val checkR = elemNullable(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(v: String, e: Expression, i: String): String =
        if (elemType(e) == FloatType) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      // freshName: several DotProducts can share one codegen scope
      // (e.g. dot/(norm*norm)) — fixed names would collide and kick the
      // whole stage back to the interpreted path
      val n = ctx.freshName("dpN")
      val sum = ctx.freshName("dpSum")
      val i = ctx.freshName("dpI")
      // element null checks only when the array type admits null
      // elements — the unit-vector hot path (containsNull=false) pays
      // nothing; `ev.isNull` is only assignable when nullable is true,
      // which the element-nullability override above guarantees here
      val nullChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val guard =
        if (nullChecks.isEmpty) ""
        else s"""if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"""
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $sum += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two array<int> columns (quantization
  * codes), returning a long — the scoring kernel of the scalar-
  * quantized ANN path ([[graft.operators.Similarity.quantizedTopK]]).
  * Integer arithmetic is EXACT: quantized scores carry no FP noise, so
  * rankings are bit-identical across engines by construction. Same
  * fused codegen loop as [[DotProduct]]; a null element poisons the
  * result to null, matching the HOF `aggregate(zip_with(...))` form.
  * 64 dims × 255² maxes at ~4.2e6 per element — a long never
  * overflows below ~10¹² dimensions.
  */
case class IntDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "int_dot_product"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot_product needs array<int> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkL = elemNullable(left)
    val checkR = elemNullable(right)
    var s = 0L
    var i = 0
    while (i < n) {
      if ((checkL && x.isNullAt(i)) || (checkR && y.isNullAt(i))) return null
      s += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("idpN")
      val sum = ctx.freshName("idpSum")
      val i = ctx.freshName("idpI")
      val nullChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val guard =
        if (nullChecks.isEmpty) ""
        else s"""if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"""
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $sum += (long) $a.getInt($i) * $b.getInt($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Scale an array<float|double> to unit L2 length, returning
  * array<double> — norm computed once, then one division per element.
  *
  * The composable form (`transform(v, x -> x / l2Norm(v))`) is a trap:
  * the norm alias is referenced exactly once (inside the lambda), so
  * CollapseProject inlines it and the O(d) norm fold re-runs for every
  * element — O(d²) per row. Identical IEEE sequence to the composable
  * form's intent (sum of squares in element order, sqrt, divide), so
  * oracle comparisons are unaffected.
  */
case class UnitVector(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unit_vector needs array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = a.numElements()
    val vals = new Array[Double](n)
    var i = 0
    var ss = 0.0
    while (i < n) {
      // a corrupt (null-element) vector must surface as a null result,
      // not silently read as 0.0 and produce a plausible wrong score
      if (a.isNullAt(i)) return null
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vals(i) = v
      ss += v * v
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = vals(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Parse a substring of a lowercase-hex string column into a long —
  * replaces `conv(substring(md5(x), from, len), 16, 10).cast(long)`,
  * which round-trips through BigInteger and a decimal string. This is
  * the per-shingle/per-token inner loop of the md5-family dedup path;
  * `len` ≤ 15 keeps the value positive in 60 bits. Bit-identical to the
  * conv form (both parse the same hex digits).
  */
case class HexSliceToLong(child: Expression, from: Int, len: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(len <= 15, "more than 15 hex digits would overflow a positive long")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hex_slice needs a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var v = 0L
    var i = from - 1
    val end = math.min(s.length, from - 1 + len)
    while (i < end) {
      val c = s.charAt(i)
      v = (v << 4) | (if (c <= '9') c - '0' else c - 'a' + 10)
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("hexS")
      val v = ctx.freshName("hexV")
      val end = ctx.freshName("hexEnd")
      val i = ctx.freshName("hexI")
      val ch = ctx.freshName("hexCh")
      s"""
         |java.lang.String $s = $c.toString();
         |long $v = 0L;
         |int $end = java.lang.Math.min($s.length(), ${from - 1 + len});
         |for (int $i = ${from - 1}; $i < $end; $i++) {
         |  char $ch = $s.charAt($i);
         |  $v = ($v << 4) | ($ch <= '9' ? $ch - '0' : $ch - 'a' + 10);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-API surface for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API surface for [[IntDotProduct]]. */
  def intDotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column surface for [[UnitVector]]. */
  def unitVector(c: Column): Column =
    GraftColumnBridge.column(UnitVector(GraftColumnBridge.expression(c)))

  /** Column surface for [[HexSliceToLong]]. */
  def hexSliceToLong(c: Column, from: Int, len: Int): Column =
    GraftColumnBridge.column(
      HexSliceToLong(GraftColumnBridge.expression(c), from, len))

  /** Register `dot_product` for spark.sql callers. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}

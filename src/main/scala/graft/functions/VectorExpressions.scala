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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
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
      s"""
         |int n = Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  sum += ${get(a, left, "i")} * ${get(b, right, "i")};
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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
      s"""
         |java.lang.String s = $c.toString();
         |long v = 0L;
         |int end = java.lang.Math.min(s.length(), ${from - 1 + len});
         |for (int i = ${from - 1}; i < end; i++) {
         |  char ch = s.charAt(i);
         |  v = (v << 4) | (ch <= '9' ? ch - '0' : ch - 'a' + 10);
         |}
         |${ev.value} = v;
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

  /** Column surface for [[HexSliceToLong]]. */
  def hexSliceToLong(c: Column, from: Int, len: Int): Column =
    GraftColumnBridge.column(
      HexSliceToLong(GraftColumnBridge.expression(c), from, len))

  /** Register `dot_product` for spark.sql callers. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}

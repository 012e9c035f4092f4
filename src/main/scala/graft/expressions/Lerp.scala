package graft.expressions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `lerp(x, x0, x1, y0, y1)` — reference-exact linear interpolation
  * `(y0·(x1−x) + y1·(x−x0)) / (x1−x0)` with the reference's per-type
  * arithmetic (`tsl/src/nodes/gapfill/interpolate.c:20,222-291`):
  *
  *  - integer y (byte/short/int/long): exact arbitrary-precision math,
  *    quotient rounded HALF-AWAY-FROM-ZERO — the reference routes all
  *    integer types through PostgreSQL NUMERIC ("the answer is rounded and
  *    not truncated", and int64·int64 products must not overflow; its
  *    `gapfill.sql` big-int golden interpolates between int64 min and max);
  *  - float/double y: native float/double math, shortcircuited to `y0`
  *    when `y0 == y1` ("otherwise output will be unstable for certain
  *    values due to float rounding", interpolate.c:256-259) — float4 stays
  *    in 32-bit arithmetic like C's usual conversions do;
  *  - decimal y: exact math, result rounded HALF_UP to the input scale.
  *
  * Result type = y type, like the reference (an integer column
  * interpolates to integers, not doubles). `CodegenFallback` is fine here:
  * this evaluates on gapfilled post-aggregation rows (one per injected
  * bucket), never inside a scan loop.
  */
case class Lerp(x: Expression, x0: Expression, x1: Expression,
    y0: Expression, y1: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(x, x0, x1, y0, y1)
  override def dataType: DataType = y0.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "lerp"

  override def checkInputDataTypes(): TypeCheckResult = {
    val xsOk = Seq(x, x0, x1).forall(_.dataType == LongType)
    val yOk = (y0.dataType, y1.dataType) match {
      case (a, b) if a != b => false
      case (_: NumericType, _) => true
      case _ => false
    }
    if (xsOk && yOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lerp needs (long, long, long, y, y) with numeric y of one type, got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val xv = vs(0).asInstanceOf[Long]
    val x0v = vs(1).asInstanceOf[Long]
    val x1v = vs(2).asInstanceOf[Long]
    if (x1v == x0v) return null // degenerate anchors (reference never emits)
    dataType match {
      case FloatType =>
        val a = vs(3).asInstanceOf[Float]; val b = vs(4).asInstanceOf[Float]
        if (a == b) a
        else (a * (x1v - xv).toFloat + b * (xv - x0v).toFloat) / (x1v - x0v).toFloat
      case DoubleType =>
        val a = vs(3).asInstanceOf[Double]; val b = vs(4).asInstanceOf[Double]
        if (a == b) a
        else (a * (x1v - xv).toDouble + b * (xv - x0v).toDouble) / (x1v - x0v).toDouble
      case t @ (ByteType | ShortType | IntegerType | LongType) =>
        def asBig(v: Any): BigInt = v match {
          case b: Byte => BigInt(b); case s: Short => BigInt(s)
          case i: Int => BigInt(i); case l: Long => BigInt(l)
        }
        val q = exactQuotient(asBig(vs(3)), asBig(vs(4)), xv, x0v, x1v, scale = 0)
        t match {
          case ByteType => q.byteValueExact()
          case ShortType => q.shortValueExact()
          case IntegerType => q.intValueExact()
          case LongType => q.longValueExact()
        }
      case d: DecimalType =>
        val a = vs(3).asInstanceOf[Decimal].toJavaBigDecimal
        val b = vs(4).asInstanceOf[Decimal].toJavaBigDecimal
        val q = exactQuotient(a, b, xv, x0v, x1v, d.scale)
        Decimal(q, d.precision, d.scale)
    }
  }

  private def exactQuotient(a: BigInt, b: BigInt, xv: Long, x0v: Long,
      x1v: Long, scale: Int): JBigDecimal =
    exactQuotient(new JBigDecimal(a.bigInteger), new JBigDecimal(b.bigInteger),
      xv, x0v, x1v, scale)

  private def exactQuotient(a: JBigDecimal, b: JBigDecimal, xv: Long,
      x0v: Long, x1v: Long, scale: Int): JBigDecimal = {
    def big(l: Long) = JBigDecimal.valueOf(l)
    val num = a.multiply(big(x1v).subtract(big(xv)), MathContext.UNLIMITED)
      .add(b.multiply(big(xv).subtract(big(x0v)), MathContext.UNLIMITED))
    // HALF_UP on the quotient = PostgreSQL NUMERIC's round-half-away
    num.divide(big(x1v).subtract(big(x0v)), scale, RoundingMode.HALF_UP)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(x = cs(0), x0 = cs(1), x1 = cs(2), y0 = cs(3), y1 = cs(4))
}

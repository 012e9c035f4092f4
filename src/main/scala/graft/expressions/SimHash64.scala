package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array: bit j of the result is set iff
  * Σ_tokens sign_j(token) > 0, where sign_j(t) is +1 when the j-th affine
  * permutation of the token's [[PortableHash]] lands in the upper half of
  * Z_P, else −1. Single pass over the tokens with a 64-int vote vector —
  * O(tokens·64) ops per row, no per-bit re-scan.
  *
  * Every per-bit value is reproducible in plain 64-bit SQL arithmetic, so
  * the DuckDB oracle (`SparkEntry.oracleSql("q18_simhash")`) recomputes the
  * hash exactly (checked as four 16-bit chunks — a 64-bit value with the
  * top bit set doesn't round-trip portably through signed SQL integers).
  */
case class SimHash64(child: Expression) extends UnaryExpression with NullSafeEvalCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import PortableHash._
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val th = tokenHash(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          val g = (SimHash64.permAs(j) * th + SimHash64.permBs(j)) % P
          if (2L * g >= P) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** Bit-j permutation constants — offset +100 so they are independent of
    * the MinHash family's indices 0..k-1.
    */
  val permAs: Array[Long] = Array.tabulate(64)(j => PortableHash.permA(j + 100))
  val permBs: Array[Long] = Array.tabulate(64)(j => PortableHash.permB(j + 100))
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `lsh_band_keys(vec)`: all `bands` random-hyperplane band keys of an
  * embedding in ONE expression — array of (band, bucket) structs, bucket =
  * the `planesPerBand` sign bits packed into a long.
  *
  * The column formulation (`bands × planesPerBand` separate `dot_product`
  * calls against `typedLit` plane arrays) embeds thousands of literals in
  * the plan: at 28 planes × 64 dims the janino compile + constant handling
  * cost ~3.7 s BEFORE any row was processed. Here the planes live in the
  * expression (derived from `seed` via [[hyperplanes]]), the plan carries
  * four ints, and each row does one m×dim loop.
  *
  * Per-plane dot products accumulate left-to-right in doubles, mirroring
  * [[DotProduct]] exactly, so band keys are bit-identical to the column
  * formulation.
  */
case class LshBandKeys(child: Expression, planesPerBand: Int, bands: Int,
    dim: Int, seed: Long) extends UnaryExpression with NullSafeEvalCodegen {
  require(planesPerBand >= 1 && planesPerBand <= 63 && bands >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys needs array<float|double>, got ${dt.sql}")
  }

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // [plane][component], flattened per band below
  private lazy val planes: Array[Array[Double]] =
    LshBandKeys.hyperplanes(bands * planesPerBand, dim, seed)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < planesPerBand) {
        val plane = planes(b * planesPerBand + j)
        val n = math.min(arr.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          acc += xv * plane(i)
          i += 1
        }
        if (acc >= 0) bucket |= 1L << j
        j += 1
      }
      out(b) = InternalRow(b, bucket)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBandKeys {
  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * 64-bit avalanche of (seed, p, j), uniform in [-1, 1).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j =>
        var h = seed ^ (p * 0x9E3779B97F4A7C15L) ^ (j * 0xC2B2AE3D27D4EB4FL)
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }
}

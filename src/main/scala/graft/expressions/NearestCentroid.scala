package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `nearest_centroid(vec)`: index of the closest centroid by squared
  * euclidean distance — the IVF coarse-quantizer assignment. The centroid
  * matrix lives INSIDE the expression object (serialized once per task),
  * never as plan literals: nlist × dim literal arrays would re-trip the
  * janino/plan-size tax measured for LSH banding (see [[LshBandKeys]]).
  *
  * Ties break toward the lower index (deterministic).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with NullSafeEvalCodegen {
  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<float|double>, got ${dt.sql}")
  }

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val diff = xv - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `pq_encode(vec)`: product-quantization codes — the vector split into
  * M contiguous subspaces, each mapped to the index of its nearest
  * sub-codebook centroid (squared euclidean, ties to the lower index).
  * Returns array<int> of M codes: the D·32-bit vector becomes M small
  * ints, the standard memory lever for billion-vector ANN (Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search").
  *
  * Codebooks (M × K × dsub) live inside the expression object, serialized
  * once per task — same plan-size rationale as [[NearestCentroid]].
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with NullSafeEvalCodegen {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one non-empty sub-codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${dt.sql}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        val lim = math.min(dsub, math.max(arr.numElements() - off, 0))
        while (i < lim) {
          val xv =
            if (isFloat) arr.getFloat(off + i).toDouble else arr.getDouble(off + i)
          val diff = xv - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_adc_score(codes)`: asymmetric-distance cosine APPROXIMATION from PQ
  * codes alone — per subspace, a precomputed table holds the query
  * subvector's dot product with each centroid and the centroid's squared
  * norm; the score is Σ dots / sqrt(Σ norms²), i.e. cosine of the query
  * against the RECONSTRUCTED vector, up to the constant ‖q‖ (irrelevant
  * for ranking). One table lookup per subspace per row — no vector read.
  */
case class PqAdcScore(child: Expression,
    dotTables: Array[Array[Double]], normSqTables: Array[Array[Double]])
    extends UnaryExpression with NullSafeEvalCodegen {
  require(dotTables.length == normSqTables.length && dotTables.nonEmpty,
    "pq_adc_score: table shape mismatch")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score needs array<int> codes, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), dotTables.length)
    var dot = 0.0
    var nsq = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      dot += dotTables(s)(c)
      nsq += normSqTables(s)(c)
      s += 1
    }
    if (nsq <= 0.0) 0.0 else dot / math.sqrt(nsq)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

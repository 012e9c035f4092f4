package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bigram_lm_score(buckets)`: total log-probability of a document under a
  * hashed-bigram language model — the CCNet-style quality signal (Wenzek
  * et al. 2020 score documents by LM perplexity against a clean corpus).
  * Input is the document's token-bucket sequence ([[TokenBuckets]], B
  * buckets); the model is a DENSE B×B table of add-1-smoothed bigram
  * log-probs `ln((c2[p,c]+1)/(c1[p]+B))` embedded in the expression
  * (B=256 → 512 KB, serialized once per task — never a plan literal).
  *
  * The sum runs in DOCUMENT ORDER as a sequential fold, so the double is
  * engine-exact: the DuckDB oracle replays the identical fold. Documents
  * with fewer than 2 tokens score null (no bigram evidence).
  */
case class BigramLmScore(child: Expression, lam: Array[Double], buckets: Int)
    extends UnaryExpression with NullSafeEvalCodegen {
  require(buckets >= 2 && lam.length == buckets * buckets,
    s"bigram_lm_score: table must be ${buckets}x$buckets")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bigram_lm_score needs array<int> token buckets, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bs = v.asInstanceOf[ArrayData]
    val n = bs.numElements()
    if (n < 2) return null
    var s = 0.0
    var i = 1
    while (i < n) {
      s += lam(bs.getInt(i - 1) * buckets + bs.getInt(i))
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

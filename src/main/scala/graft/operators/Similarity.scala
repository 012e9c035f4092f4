package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and a deterministic random-hyperplane LSH variant as the
  * 100 TB scale path (signature bucketing turns the O(n) scan per query /
  * O(n²) pair search into a bucket-local one).
  *
  * Dot products fold left-to-right over doubles (`aggregate(zip_with(...))`)
  * so the oracle can reproduce results bit-for-bit with the same fold.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in doubles, sequential fold (deterministic — same accumulation
    * order as DuckDB's list_reduce). Codegen'd single loop, no per-element
    * lambda dispatch (see [[graft.expressions.DotProduct]]).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.DotProduct(
      org.apache.spark.sql.GraftShims.toExpression(a),
      org.apache.spark.sql.GraftShims.toExpression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against a fixed query vector. The global top-k
    * is a TakeOrderedAndProject — per-partition heaps then a driver merge of
    * k·parts rows, no global sort.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    emb.select(col(idCol), cosine(col(vecCol), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from a 64-bit avalanche of (seed, p, j), uniform in [-1, 1).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { j =>
        var h = seed ^ (p * 0x9E3779B97F4A7C15L) ^ (j * 0xC2B2AE3D27D4EB4FL)
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** LSH signature: bit p = sign(v · plane_p), packed into a long. */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dot(vec, typedLit(plane)) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: candidates = vectors whose signature is within `maxFlips`
    * bits of the query's (multi-probe), exact cosine rerank on candidates.
    * Recall < 1 by construction; bucket scan replaces the full scan.
    */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numPlanes: Int = 12, maxFlips: Int = 2,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, query.length, seed)
    var qSig = 0L
    planes.zipWithIndex.foreach { case (plane, p) =>
      val d = plane.zip(query).map { case (x, y) => x * y }.sum
      if (d >= 0) qSig |= (1L << p)
    }
    val withSig = emb.withColumn("_sig", lshSignature(col(vecCol), planes))
    val cands = withSig.where(bit_count(col("_sig").bitwiseXOR(lit(qSig))) <= maxFlips)
    bruteForceTopK(cands, idCol, vecCol, query, k)
  }

  /** All pairs with cosine >= threshold — brute self-join baseline
    * (exact; O(n²), for modest n or as the in-bucket verifier). Norms are
    * computed once per row BEFORE the join (1 dot per pair, not 3);
    * `dot/(normA*normB)` keeps the oracle's arithmetic order.
    */
  def bruteForcePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      norm(col(vecCol)).as("n_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      norm(col(vecCol)).as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding near-dup pairs at scale: LSH-bucket the vectors, compare
    * only within buckets (signature equality), exact-cosine verify.
    */
  def lshPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 10, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val withSig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), planes).as("sig"))
    val a = withSig.as("a")
    val b = withSig.as("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.v"), col("b.v")))
      .where(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}

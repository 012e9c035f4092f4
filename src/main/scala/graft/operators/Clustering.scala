package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering for dedup pipelines: given near-duplicate candidate
  * PAIRS (from [[Dedup.nearDuplicatePairs]], [[Similarity.lshPairs]], or
  * exact-dup groups), assign every document the minimum reachable id of its
  * connected component, so each duplicate CLUSTER — not just each pair —
  * has one canonical survivor. (The reference engine has no graph ops; this
  * is part of the training-data surface built on the same Spark core.)
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round is
  * a groupBy(min) + an equi-join over the edge list, and the edge set
  * contracts toward one star per component in O(log²) rounds. Chosen over
  * per-round label propagation (O(diameter) rounds — a 100-doc duplicate
  * chain is 100 shuffles there, ~7 here) and over driver-side union-find
  * (not distributed). No neighborhood is ever materialized as an array:
  * the per-node minimum is a scalar aggregate joined back to the edge
  * list, so a boilerplate super-node with 10⁷ neighbors is just a skewed
  * join key (AQE skew handling applies), never a 10⁷-element row. Every
  * round ends in `localCheckpoint`, keeping lineage O(1) per round instead
  * of exponentially nested.
  *
  * At 100 TB: edge count ≈ near-dup pair count, far smaller than the
  * corpus; each round shuffles only the (long, long) edge list hashed by
  * node id.
  */
object Clustering {

  /** Connected components of the undirected graph given by an edge list.
    * Returns one row per node appearing in `edges`: (`node`, `component`)
    * where `component` is the minimum node id reachable from `node`.
    * Isolated nodes (no edges) don't appear — left-join and coalesce to
    * default them to their own id, as [[clusterAssignments]] does.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30): DataFrame = {
    // numeric ids normalize to long; string ids are orderable as-is. A
    // blind cast("long") would turn 'doc-123' into NULL (non-ANSI) and
    // silently drop every edge — fail fast on types min/least can't order.
    def key(c: String) = edges.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(c).cast("long")
      case org.apache.spark.sql.types.StringType => col(c)
      case other => throw new IllegalArgumentException(
        s"connectedComponents: unsupported id type $other for column $c")
    }
    // undirected, no self-loops, deduped, canonical (u < v); lineage
    // truncated up front so the (possibly expensive) pair-generation plan
    // runs exactly once
    var (e, eBlocks) = checkpoint(edges
      .select(key(srcCol).as("u"), key(dstCol).as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct())

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star(u): m = min(N(u) ∪ {u}); connect every neighbor w > u
      // to m. Neighborhoods come from the symmetric edge view; the min is
      // a scalar joined back per node.
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = nbrs.join(mins, "u")
        .where(col("v") > col("u") && col("v") =!= col("m"))
        .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
        .distinct()

      // small-star(u): over the smaller-than-u neighborhood N⁻(u),
      // m = min(N⁻(u)); connect every w ∈ N⁻(u) ∪ {u}, w ≠ m, to m.
      // `large` is canonical (u < v), so the flipped view (v → u) IS the
      // smaller-neighbor list of v. Both stars run in ONE lineage — only
      // the round result is checkpointed.
      val le = large.select(col("v").as("u"), col("u").as("v"))
      val sm = le.groupBy("u").agg(min(col("v")).as("m"))
      val (small, smallBlocks) = checkpoint(le.join(sm, "u")
        .where(col("v") =!= col("m"))
        .select(col("m").as("u"), col("v"))
        .union(sm.select(col("m").as("u"), col("u").as("v"))) // u itself → m
        .where(col("u") =!= col("v"))
        .distinct())

      // converged ⟺ edge set unchanged (exact symmetric diff, one job)
      converged = small
        .withColumn("_n", lit(1))
        .join(e.withColumn("_o", lit(1)), Seq("u", "v"), "full_outer")
        .where(col("_n").isNull || col("_o").isNull)
        .limit(1).count() == 0
      // previous round's checkpoint blocks are dead now — free them
      // instead of pinning O(rounds) edge lists in executor storage
      eBlocks.unpersist(blocking = false)
      e = small
      eBlocks = smallBlocks
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // final graph is one star per component: every edge is (min, member)
    e.select(col("v").as("node"), col("u").as("component"))
      .union(e.select(col("u").as("node"), col("u").as("component")))
      .distinct()
  }

  /** Eagerly localCheckpoint `df`, returning the checkpointed frame AND a
    * handle on its storage (the underlying RDD) so the caller can free the
    * blocks once the round that produced them is superseded —
    * `Dataset.unpersist` does not release RDD-level localCheckpoint
    * storage.
    */
  private def checkpoint(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val ck = df.localCheckpoint()
    val rdd = ck.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.head
    (ck, rdd)
  }

  /** Cluster assignment for EVERY row of `df`: near-dup pairs at
    * `threshold` → connected components → (idCol, cluster_id), where
    * cluster_id = min doc id of the duplicate cluster (docs with no
    * near-duplicate get their own id). Exact duplicates land in the same
    * cluster (jaccard 1 ≥ any threshold ≤ 1).
    */
  def clusterAssignments(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 32, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val pairs = Dedup.nearDuplicatePairs(df, idCol, textCol, threshold,
      shingleN, numHashes, bands, maxBucketSize)
    val cc = connectedComponents(pairs, s"${idCol}_a", s"${idCol}_b")
    val isNumeric =
      df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val cid = coalesce(col("component"), col(idCol))
    df.select(col(idCol))
      .join(cc, col(idCol) === col("node"), "left")
      .select(col(idCol),
        (if (isNumeric) cid.cast("long") else cid).as("cluster_id"))
  }
}

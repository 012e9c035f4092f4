package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup, Sampling, TextAnalysis}

/** Scratch stage-by-stage profile of q93 (Test scope, not part of the
  * library).
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("pipeline-profile", "local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    val docs = Tables.table(spark, dir, "documents")
    docs.write.mode("overwrite").format("noop").save()

    val filtered = time("gopher_filter+checkpoint") {
      docs.withColumn("_g", TextAnalysis.gopher_rules(col("text")))
        .where(col("_g.pass_gopher")).drop("_g")
        .localCheckpoint()
    }
    println("filtered rows: " + filtered.count())
    val cands = time("lsh_candidates") {
      val c = Dedup.lshCandidatePairs(filtered, "doc_id", "text", 3, 32, 32, 1000)
        .localCheckpoint()
      println("cand pairs: " + c.count())
      c
    }
    val candIds = cands.select(
      explode(array(col("doc_id_a"), col("doc_id_b"))).as("doc_id"))
    val sh = filtered.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val verified = time("verify_join") {
      val v = cands
        .join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("sh", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sh", "sh_b"), "doc_id_b")
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.5)
        .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
        .localCheckpoint()
      println("verified pairs: " + v.count())
      v
    }
    val cc = time("connected_components") {
      val c = Clustering.connectedComponents(verified, "doc_id_a", "doc_id_b")
        .localCheckpoint()
      println("cc rows: " + c.count())
      c
    }
    time("rest_of_pipeline") {
      val assign = filtered.select(col("doc_id"))
        .join(cc, col("doc_id") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).cast("long").as("cluster_id"))
      val q = filtered.select(col("doc_id").as("_graft_qid"), col("n_chars").as("_graft_q"))
      val labeled = Clustering.keepBestPerCluster(
          assign.join(q, col("doc_id") === col("_graft_qid")),
          "doc_id", "cluster_id", col("_graft_q"))
        .select(col("doc_id"), col("cluster_id"), col("kept"))
      val kept = filtered
        .join(labeled.where(col("kept")).select("doc_id"), "doc_id")
        .withColumn("n_tokens", TextAnalysis.token_count(col("text")).cast("long"))
      Sampling.tokenBudget(
          kept.select(col("doc_id"), col("source"), col("n_tokens")),
          "source", "doc_id", "n_tokens",
          budgets = (0 until 20).map(i => s"src$i" -> 1500L).toMap)
        .orderBy("doc_id")
        .write.mode("overwrite").format("noop").save()
    }
    // and the whole thing as the query runs it
    time("q93_full") {
      SparkEntry.queries("q93_pipeline_e2e")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}

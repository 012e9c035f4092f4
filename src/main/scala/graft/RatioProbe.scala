package graft

/** Spark side of the sf0.1 → sf1 ratio measurement (SCALE.md §17): runs a
  * fixed set of FAIR compute rows (both engines execute comparable
  * algorithms — no machinery-bias rows, no deliberately-quadratic
  * oracles) from [[SparkEntry.queries]] against two data dirs and prints
  * one JSON line per dir. The DuckDB side is `tools/ratio_probe.py` over
  * the same dirs; BASELINE.md's claim under test: Spark's fixed per-query
  * overhead (~0.1–0.3 s) amortizes as the scale grows, so the per-query
  * ratio tightens toward the engines' streaming throughput ratio.
  */
object RatioProbe {
  private val Names = Seq("q01_pricing_summary", "q06_uuidv7_roundtrip",
    "q11_token_count", "q12_quality_score", "q17_minhash_sig", "q18_simhash",
    "q20_join_revenue", "q22_window_delta", "q41_time_bucket_tz",
    "q42_ngram_jaccard", "q50_ngram_stats", "q91_lm_quality")

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    // SPARK_GRAFT_RATIO_NAMES narrows to a subset — the sf3-equivalent
    // third point (SCALE.md §17) re-times only the rows whose DuckDB
    // cost is already tens of seconds at sf1
    val names = sys.env.get("SPARK_GRAFT_RATIO_NAMES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Names)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.session("graft-ratio-probe", s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val res = names.flatMap { n =>
        SparkEntry.queries.get(n).map { q =>
          def run(): Double = {
            val t0 = System.nanoTime()
            q(spark, dir).write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9
          }
          run() // warmup (plan + page cache)
          n -> math.min(run(), run())
        }
      }
      println(s"""[ratio] {"sfdir":"$dir","spark_sec":{${
        res.map { case (n, t) => s""""$n":${f"$t%.3f"}""" }.mkString(",")}}}""")
    }
    spark.stop()
  }
}

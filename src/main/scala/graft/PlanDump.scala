package graft


/** Dumps `.explain("formatted")` for the named queries (comma-separated
  * prefixes in SPARK_GRAFT_PLANS; unset = ALL queries) to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization-round
  * evidence files (judge checks plan claims against these).
  *
  * Usage: SPARK_GRAFT_PLANS=q01,q20 SPARK_GRAFT_PLAN_SUFFIX=before \
  *   sbt "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r13")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val names = sys.env.get("SPARK_GRAFT_PLANS").map(_.split(",").toSeq)
    val spark = Graft.toolSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(s"plans/$tag"); dir.mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$suffix.txt"))
          try w.println(txt) finally w.close()
          System.err.println(s"[plandump] wrote $name ($suffix)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

package graft

/** Scratch perf harness (Test scope, not part of the library). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("perf-scratch", "local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    // warm
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      time(n) {
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}

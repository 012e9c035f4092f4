package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("plan-check", "local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q01_pricing_summary", "q02_bucket_hourly", "q20_join_revenue", "q21_asof_join", "q15_ann_topk", "q24_topk_recent")) {
      println(s"======== $q ========")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}

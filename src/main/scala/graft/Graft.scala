package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap: SQL function registration + scale-oriented defaults.
  * Call [[Graft.init]] on any session before using graft SQL functions;
  * the Column-API facade in [[graft.functions]] works without it.
  */
object Graft {

  /** Register graft SQL functions + optimizer rules on an existing
    * session. Idempotent. (New sessions can instead be built with
    * `withExtensions(new GraftExtensions)` / `spark.sql.extensions`.)
    */
  def init(spark: SparkSession): SparkSession = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SortTransform))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SortTransform
    spark
  }

  /** Local session with the defaults every graft entry point uses. */
  def session(appName: String = "graft", master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    init(SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
  }
}

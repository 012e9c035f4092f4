package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expressions.TimeBucket

/** Session bootstrap: SQL function registration + scale-oriented defaults.
  * Call [[Graft.init]] on any session before using graft SQL functions;
  * the Column-API facade in [[graft.functions]] works without it.
  */
object Graft {

  /** Register graft SQL functions on an existing session. Idempotent. */
  def init(spark: SparkSession): SparkSession = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("time_bucket", {
      case Seq(w, t)    => TimeBucket(w, t, None)
      case Seq(w, t, o) => TimeBucket(w, t, Some(o))
      case exprs: Seq[Expression] =>
        throw new IllegalArgumentException(
          s"time_bucket requires 2 or 3 arguments, got ${exprs.length}")
    }, "scala_udf")
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

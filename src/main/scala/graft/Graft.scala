package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expressions._

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
    def reg1(name: String, f: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { case Seq(e) => f(e) }, "scala_udf")
    reg1("to_uuidv7", ToUuidV7(_, boundary = false))
    reg1("to_uuidv7_boundary", ToUuidV7(_, boundary = true))
    reg1("uuid_timestamp", UuidTimestamp(_, withMicros = false))
    reg1("uuid_timestamp_micros", UuidTimestamp(_, withMicros = true))
    reg1("uuid_version", UuidVersion(_))
    reg.createOrReplaceTempFunction("generate_uuidv7",
      { case Seq() => GenerateUuidV7() }, "scala_udf")
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the TESTDATA parquet tables.
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` it
  * surfaces as a long we convert to a micros TimestampType column
  * (truncation — the same thing DuckDB's TIMESTAMP_NS→TIMESTAMP cast does,
  * keeping the oracle comparable).
  */
object Tables {

  /** Per-session memo of loaded tables — the input files are immutable
    * test fixtures, so the resolved relation (file listing + footer schema
    * read, both driver-side work Spark redoes per `read.parquet` call) is
    * reused across queries like a catalog table would be. Keyed by session
    * so test suites with their own sessions don't cross wires.
    */
  private val cache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        cache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name), _ => load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  val names = Seq("region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}

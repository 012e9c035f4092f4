package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the TESTDATA parquet tables.
  *
  * Fixture timestamp columns are normalized to the session-zone instant
  * type (`TimestampType`) every operator computes on:
  *  - TIMESTAMP(NANOS) files (earlier fixture generations) surface as a
  *    long under `spark.sql.legacy.parquet.nanosAsLong` and are truncated
  *    to micros — the same thing DuckDB's TIMESTAMP_NS→TIMESTAMP cast
  *    does, keeping the oracle comparable;
  *  - naive TIMESTAMP(MICROS) files (current generation) read as
  *    `TIMESTAMP_NTZ` and are cast, which under the UTC sessions every
  *    graft entry point pins is value-preserving — DuckDB reads the same
  *    files as naive TIMESTAMP and computes on identical wall clocks.
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

  /** Read a parquet path, tolerating legacy TIMESTAMP(NANOS) fixtures: the
    * plain read is tried FIRST, so on current-generation (micros) fixtures
    * no session conf is ever touched. Only if the footer actually carries
    * nanos (Spark refuses the type outright) is
    * `spark.sql.legacy.parquet.nanosAsLong` enabled — and then it must stay
    * on for the session, because the scan re-reads the footer at execution
    * time; such a session is wholesale reading legacy fixtures anyway.
    */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception
          if String.valueOf(e.getMessage).toUpperCase.contains("NANOS") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = readParquet(spark, s"$dir/$name.parquet")
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed)((d, f) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  val names = Seq("region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}

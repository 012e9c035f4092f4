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
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  val names = Seq("region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UuidV7Util
import graft.{functions => gf}

class UuidV7Spec extends AnyFunSuite {
  lazy val spark = Graft.session("uuid-spec", "local[4]", 4)
  import spark.implicits._

  test("sub-ms scaling round-trips every microsecond fraction 0..999") {
    for (us <- 0L until 1000L) {
      val b = UuidV7Util.create(1700000000000000L + us, boundary = true)
      val rt = UuidV7Util.unixMs(b) * 1000L + UuidV7Util.extraMicros(b)
      assert(rt === 1700000000000000L + us, s"us=$us")
    }
  }

  test("boundary uuid has version 7, RFC variant, zero random tail") {
    val b = UuidV7Util.create(1700000000123456L, boundary = true)
    assert(UuidV7Util.version(b) === 7)
    assert((b(8) & 0xc0) === 0x80)
    assert(b.drop(9).forall(_ === 0))
    val s = UuidV7Util.format(b).toString
    assert(s.matches("[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(UuidV7Util.parse(UuidV7Util.format(b)).sameElements(b))
  }

  test("column round-trip on real timestamps") {
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.789123")
    val got = Seq(ts).toDF("ts")
      .select(gf.uuid_timestamp_micros(gf.to_uuidv7_boundary($"ts")).as("rt"),
        gf.uuid_timestamp(gf.to_uuidv7_boundary($"ts")).as("rt_ms"),
        gf.uuid_version(gf.to_uuidv7_boundary($"ts")).as("v"))
      .head()
    assert(got.getTimestamp(0) === ts)
    assert(got.getTimestamp(1) === Timestamp.valueOf("2024-03-01 12:34:56.789"))
    assert(got.getInt(2) === 7)
  }

  test("uuid_timestamp rejects non-v7 uuids instead of decoding garbage") {
    val e = intercept[Exception] {
      Seq("f47ac10b-58cc-4372-a567-0e02b2c3d479") // v4
        .toDF("u").select(gf.uuid_timestamp($"u")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("version-7")), s"unexpected error: $e")
  }

  test("generate_uuidv7 is a parseable v7 uuid") {
    Graft.init(spark)
    val s = spark.sql("SELECT generate_uuidv7() AS u, uuid_version(generate_uuidv7()) AS v").head()
    assert(s.getString(0).length === 36)
    assert(s.getInt(1) === 7)
  }
}

package graft.expressions

import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UUIDv7 helpers mirroring the reference's `sql/uuidv7.sql:5-42` /
  * `src/uuid.c:61-210`: 48-bit unix-ms timestamp, version 7, RFC9562
  * variant, and the sub-millisecond microsecond fraction scaled into the
  * 12-bit rand_a field exactly like the reference (`(us % 1000) * 4096 /
  * 1000`, reversed with the `+1` floor trick so round-trips are exact).
  *
  * UUIDs are carried as canonical lowercase strings (Spark has no UUID
  * type). Unary forms stay in whole-stage codegen via NullSafeEvalCodegen.
  */
object UuidV7Util {
  /** bytes[16] of a v7 uuid for a unix-micros timestamp; zeroed random bits
    * when boundary, deterministic-from-rng otherwise.
    */
  def create(unixMicros: Long, boundary: Boolean): Array[Byte] = {
    val b = new Array[Byte](16)
    if (!boundary) ThreadLocalRandom.current().nextBytes(b)
    val ms = Math.floorDiv(unixMicros, 1000L)
    var i = 0
    while (i < 6) { b(i) = ((ms >>> (40 - 8 * i)) & 0xff).toByte; i += 1 }
    val tsMicros = (Math.floorMod(unixMicros, 1000L) * (1 << 12) / 1000).toInt
    b(6) = ((tsMicros >> 8) & 0x0f | 0x70).toByte // version 7 + top 4 sub-ms bits
    b(7) = (tsMicros & 0xff).toByte
    b(8) = (((if (boundary) 0 else b(8)) & 0x3f) | 0x80).toByte // RFC9562 variant
    b
  }

  def format(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      val v = b(i) & 0xff
      sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def parse(s: UTF8String): Array[Byte] = {
    val str = s.toString.replace("-", "")
    require(str.length == 32, s"invalid uuid: $s")
    val b = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      b(i) = Integer.parseInt(str.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    b
  }

  def version(b: Array[Byte]): Int = (b(6) & 0xf0) >> 4

  /** unix millis from the first 48 bits. */
  def unixMs(b: Array[Byte]): Long = {
    var ms = 0L
    var i = 0
    while (i < 6) { ms = (ms << 8) | (b(i) & 0xffL); i += 1 }
    ms
  }

  /** sub-ms micros from rand_a, reversing the 12-bit scaling. */
  def extraMicros(b: Array[Byte]): Long =
    ((((b(6) & 0x0f) << 8) | (b(7) & 0xff)) + 1) * 1000L / (1 << 12)
}

/** to_uuidv7(ts) / to_uuidv7_boundary(ts): timestamp → uuid string. */
case class ToUuidV7(child: Expression, boundary: Boolean)
    extends UnaryExpression with NullSafeEvalCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = if (boundary) "to_uuidv7_boundary" else "to_uuidv7"
  override lazy val deterministic: Boolean = boundary
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a timestamp, got ${dt.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    UuidV7Util.format(UuidV7Util.create(v.asInstanceOf[Long], boundary))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** generate_uuidv7(): random v7 uuid at current time. */
case class GenerateUuidV7() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "generate_uuidv7"
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any =
    UuidV7Util.format(UuidV7Util.create(System.currentTimeMillis() * 1000L, boundary = false))
}

/** uuid_timestamp(uuid) (ms precision) / uuid_timestamp_micros(uuid). */
case class UuidTimestamp(child: Expression, withMicros: Boolean)
    extends UnaryExpression with NullSafeEvalCodegen {
  override def dataType: DataType = TimestampType
  override def prettyName: String = if (withMicros) "uuid_timestamp_micros" else "uuid_timestamp"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a uuid string, got ${dt.sql}")
  }
  override def nullSafeEval(v: Any): Any = {
    val b = UuidV7Util.parse(v.asInstanceOf[UTF8String])
    // only v7 carries a timestamp; interpreting another version's random
    // bytes as one yields valid-looking garbage — error like the
    // reference's uuid.c does
    require(UuidV7Util.version(b) == 7,
      s"$prettyName: not a version-7 uuid (version ${UuidV7Util.version(b)}): $v")
    val us = UuidV7Util.unixMs(b) * 1000L
    if (withMicros) us + UuidV7Util.extraMicros(b) else us
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** uuid_version(uuid): version nibble. */
case class UuidVersion(child: Expression) extends UnaryExpression with NullSafeEvalCodegen {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "uuid_version"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a uuid string, got ${dt.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    UuidV7Util.version(UuidV7Util.parse(v.asInstanceOf[UTF8String]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

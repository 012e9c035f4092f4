package graft.expressions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.unsafe.types.CalendarInterval

/** Static bucketing kernels called from both interpreted eval and generated
  * code (one static call per row — JIT-inlineable, allocation-free on the
  * fixed-width paths).
  *
  * Semantics follow the reference's `time_bucket` exactly
  * (timescaledb `src/time_bucket.c:22-106,148-183`):
  *  - fixed-width buckets floor-align to an origin; default origin is
  *    Monday 2000-01-03 00:00:00 UTC so weekly buckets start on Monday;
  *  - month-width buckets count whole months since the origin (default
  *    2000-01-01) and floor to the enclosing `width`-month window;
  *  - flooring is true floor division (correct for timestamps before the
  *    origin, i.e. "negative" deltas).
  *
  * A caller that has no explicit origin passes [[SENTINEL]] /
  * [[SENTINEL_INT]] and the kernel substitutes the per-variant default.
  */
object TimeBucketUtil {
  final val MICROS_PER_DAY: Long = 86400000000L

  /** PostgreSQL-tolerant interval text → Spark-parsable: split digit-unit
    * adjacency in BOTH directions ('1week', the reference's own
    * cagg_ddl.sql:1461; compound '1d2h' needs the letter→digit split too or
    * 'd2' never isolates into an expandable unit token) and expand PG
    * single-letter unit abbreviations ('30m', '4h' — cagg_query_common's
    * offset caggs). No change to already-valid Spark interval text.
    */
  final def pgIntervalText(s: String): String =
    s.replaceAll("(?<=[0-9])(?=[A-Za-z])", " ")
      .replaceAll("(?<=[A-Za-z])(?=[0-9])", " ").split("\\s+").map { t =>
      t.toLowerCase(java.util.Locale.ROOT) match {
        case "d" => "days"
        case "h" => "hours"
        case "m" => "minutes"
        case "s" => "seconds"
        case "w" => "weeks"
        case _ => t
      }
    }.mkString(" ")
  /** 2000-01-03 00:00:00 UTC in micros since unix epoch. */
  final val DEFAULT_ORIGIN_MICROS: Long = 946857600000000L
  /** 2000-01-01 00:00:00 UTC in micros (origin for month-width buckets). */
  final val DEFAULT_MONTH_ORIGIN_MICROS: Long = 946684800000000L
  /** 2000-01-03 in days since unix epoch. */
  final val DEFAULT_ORIGIN_DAYS: Int = 10959
  /** 2000-01-01 in days since unix epoch. */
  final val DEFAULT_MONTH_ORIGIN_DAYS: Int = 10957

  /** "No explicit origin" sentinels (never a meaningful origin value). */
  final val SENTINEL: Long = Long.MinValue
  final val SENTINEL_INT: Int = Int.MinValue

  private def checkWidth(width: Long): Unit =
    if (width <= 0)
      throw new IllegalArgumentException(s"time_bucket width must be positive, got $width")

  /** timestamp ts, fixed micros width. */
  def bucketMicros(ts: Long, widthMicros: Long, origin: Long): Long = {
    checkWidth(widthMicros)
    val o = if (origin == SENTINEL) DEFAULT_ORIGIN_MICROS else origin
    o + Math.floorDiv(ts - o, widthMicros) * widthMicros
  }

  /** integer ts (int64 dimension), integer width; default origin 0. */
  def bucketLong(ts: Long, width: Long, origin: Long): Long = {
    checkWidth(width)
    val o = if (origin == SENTINEL) 0L else origin
    o + Math.floorDiv(ts - o, width) * width
  }

  def bucketInt(ts: Int, width: Int, origin: Int): Int = {
    checkWidth(width)
    val o = if (origin == SENTINEL_INT) 0 else origin
    o + Math.floorDiv(ts - o, width) * width
  }

  def bucketShort(ts: Short, width: Short, origin: Short): Short = {
    checkWidth(width)
    val o: Int = if (origin == Short.MinValue) 0 else origin.toInt
    (o + Math.floorDiv(ts - o, width.toInt) * width).toShort
  }

  /** date ts (days since epoch), micros width that must be whole days. */
  def bucketDays(days: Int, widthMicros: Long, originDays: Int): Int = {
    checkWidth(widthMicros)
    if (widthMicros % MICROS_PER_DAY != 0)
      throw new IllegalArgumentException(
        s"time_bucket width for DATE input must be a whole number of days")
    val wd = (widthMicros / MICROS_PER_DAY).toInt
    val o = if (originDays == SENTINEL_INT) DEFAULT_ORIGIN_DAYS else originDays
    o + Math.floorDiv(days - o, wd) * wd
  }

  private def ldtFromMicros(us: Long): LocalDateTime = {
    val secs = Math.floorDiv(us, 1000000L)
    val nanos = Math.floorMod(us, 1000000L) * 1000L
    LocalDateTime.ofEpochSecond(secs, nanos.toInt, java.time.ZoneOffset.UTC)
  }

  private def microsFromLdt(ldt: LocalDateTime): Long =
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L

  /** timestamp ts, month-width bucket: greatest `origin + k*months <= ts`. */
  def bucketMonthsMicros(ts: Long, months: Int, origin: Long): Long = {
    if (months <= 0)
      throw new IllegalArgumentException(s"time_bucket month width must be positive, got $months")
    val o = ldtFromMicros(if (origin == SENTINEL) DEFAULT_MONTH_ORIGIN_MICROS else origin)
    val d = ldtFromMicros(ts)
    var idx = Math.floorDiv(ChronoUnit.MONTHS.between(o, d), months.toLong)
    // MONTHS.between truncates toward zero and ignores sub-month remainders;
    // adjust to the true floor (converges in <= 2 steps).
    while (o.plusMonths(idx * months).isAfter(d)) idx -= 1
    while (!o.plusMonths((idx + 1) * months).isAfter(d)) idx += 1
    microsFromLdt(o.plusMonths(idx * months))
  }

  /** date ts, month-width bucket. */
  def bucketMonthsDays(days: Int, months: Int, originDays: Int): Int = {
    if (months <= 0)
      throw new IllegalArgumentException(s"time_bucket month width must be positive, got $months")
    val o = java.time.LocalDate
      .ofEpochDay((if (originDays == SENTINEL_INT) DEFAULT_MONTH_ORIGIN_DAYS else originDays).toLong)
    val d = java.time.LocalDate.ofEpochDay(days.toLong)
    var idx = Math.floorDiv(ChronoUnit.MONTHS.between(o, d), months.toLong)
    while (o.plusMonths(idx * months).isAfter(d)) idx -= 1
    while (!o.plusMonths((idx + 1) * months).isAfter(d)) idx += 1
    o.plusMonths(idx * months).toEpochDay.toInt
  }

  /** Calendar month addition in micros (for month-width chunk/bucket ends). */
  def addMonthsMicros(us: Long, months: Int): Long =
    microsFromLdt(ldtFromMicros(us).plusMonths(months.toLong))

  /** Wall-clock micros of instant `us` in `zone` — the driver-side mirror
    * of Spark's `from_utc_timestamp` (shift by the zone offset AT the
    * instant), so tz-bucket alignment computed on the driver agrees with
    * the column expression exactly.
    */
  def localMicros(us: Long, zone: java.time.ZoneId): Long = {
    val i = java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)
    us + zone.getRules.getOffset(i).getTotalSeconds * 1000000L
  }

  /** Instant micros of wall-clock `localUs` in `zone` — mirror of Spark's
    * `to_utc_timestamp` (`LocalDateTime.atZone` resolution: DST gaps shift
    * forward, overlaps take the earlier offset).
    */
  def instantMicros(localUs: Long, zone: java.time.ZoneId): Long = {
    val i = ldtFromMicros(localUs).atZone(zone).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** legacy CalendarInterval width (months XOR days+micros). */
  def bucketCalendarMicros(ts: Long, w: CalendarInterval, origin: Long): Long =
    if (w.months != 0) {
      if (w.days != 0 || w.microseconds != 0)
        throw new IllegalArgumentException(
          "time_bucket does not support mixed month/day/time widths")
      bucketMonthsMicros(ts, w.months, origin)
    } else bucketMicros(ts, w.days * MICROS_PER_DAY + w.microseconds, origin)

  /** interval offset → micros; months are ill-defined as offsets. */
  def calOffsetMicros(w: CalendarInterval): Long = {
    if (w.months != 0)
      throw new IllegalArgumentException("time_bucket offset must not contain months")
    w.days * MICROS_PER_DAY + w.microseconds
  }

  def dtOffsetDays(us: Long): Int = {
    if (us % MICROS_PER_DAY != 0)
      throw new IllegalArgumentException("time_bucket offset for DATE input must be whole days")
    (us / MICROS_PER_DAY).toInt
  }

  def calOffsetDays(w: CalendarInterval): Int = dtOffsetDays(calOffsetMicros(w))

  def bucketCalendarDays(days: Int, w: CalendarInterval, origin: Int): Int =
    if (w.months != 0) {
      if (w.days != 0 || w.microseconds != 0)
        throw new IllegalArgumentException(
          "time_bucket does not support mixed month/day/time widths")
      bucketMonthsDays(days, w.months, origin)
    } else bucketDays(days, w.days * MICROS_PER_DAY + w.microseconds, origin)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** `interval_to_usec(interval) -> bigint` — total microseconds of an
  * interval under PostgreSQL epoch-extraction conventions
  * (reference `sql/util_time.sql` interval_to_usec: `extract(epoch from
  * interval) * 1e6`, where PG counts a month as 30 days and a day as 24
  * hours). Accepts Spark's CalendarInterval (month/day/micros parts) and
  * ANSI day-time intervals (already stored as micros).
  */
case class IntervalToUsec(child: Expression)
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "interval_to_usec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case CalendarIntervalType | _: DayTimeIntervalType | _: YearMonthIntervalType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"interval_to_usec needs an interval, got ${dt.sql}")
  }

  private val MICROS_PER_DAY = 86400000000L
  private val DAYS_PER_MONTH = 30L // PG EXTRACT(EPOCH FROM interval) convention

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case CalendarIntervalType =>
      val ci = v.asInstanceOf[CalendarInterval]
      Math.addExact(
        Math.multiplyExact(ci.months.toLong * DAYS_PER_MONTH + ci.days.toLong,
          MICROS_PER_DAY),
        ci.microseconds)
    case _: DayTimeIntervalType => v.asInstanceOf[Long] // stored as micros
    case _: YearMonthIntervalType => // stored as months
      Math.multiplyExact(v.asInstanceOf[Int].toLong * DAYS_PER_MONTH, MICROS_PER_DAY)
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalToUsec =
    copy(child = newChild)
}

/** `time_to_internal(value) -> bigint` — the reference's conversion of any
  * dimension-typed value to internal time (`sql/util_time.sql`
  * time_to_internal, `ts_time_to_internal`): timestamps → Unix-epoch
  * microseconds, dates → midnight-UTC microseconds, integral dimension
  * values → bigint (their own units). NTZ timestamps are read as UTC wall
  * clocks — the exact inverse of `to_timestamp_without_timezone`.
  *
  * Cheap at eval: Spark's internal value for timestamps IS micros (and days
  * for dates), so the conversion is a branch picked at resolution, not work.
  */
case class TimeToInternal(child: Expression)
    extends UnaryExpression with NullSafeEvalCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "time_to_internal"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType | DateType
       | ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"time_to_internal: unsupported dimension type ${dt.sql}")
  }

  private val MICROS_PER_DAY = 86400000000L

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case TimestampType | TimestampNTZType => v.asInstanceOf[Long]
    case DateType => v.asInstanceOf[Int].toLong * MICROS_PER_DAY
    case _ => v.asInstanceOf[Number].longValue()
  }

  override protected def withNewChildInternal(newChild: Expression): TimeToInternal =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** `time_bucket(width, ts [, origin | offset])` — floor-align `ts` into
  * fixed-width buckets, the reference's core primitive
  * (timescaledb `src/time_bucket.c:22-106`, SQL surface `sql/time_bucket.sql:7-66`).
  *
  * Supported shapes (all null-propagating, codegen'd):
  *  - ts TIMESTAMP/TIMESTAMP_NTZ, width DAY-TIME / YEAR-MONTH / legacy
  *    CalendarInterval; optional third arg: TIMESTAMP origin or interval offset
  *  - ts DATE, width as above (day-time widths must be whole days)
  *  - ts SHORT/INT/LONG (integer time dimension), width integral; optional
  *    third integral arg is an *offset* (matches the reference's int variants)
  *
  * Month-width buckets use origin 2000-01-01; fixed widths use origin
  * Monday 2000-01-03 (so `7 days` buckets align to ISO weeks). An interval
  * offset `o` computes `bucket(ts - o) + o`.
  */
case class TimeBucket(width: Expression, ts: Expression, third: Option[Expression])
    extends Expression {

  override def children: Seq[Expression] = Seq(width, ts) ++ third
  override def nullable: Boolean = true
  override def dataType: DataType = ts.dataType
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "time_bucket"

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ShortType | IntegerType | LongType => true
    case _                                  => false
  }
  private def isTs(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case _                                => false
  }

  /** How the optional third argument is interpreted, decided by its type. */
  private object Mode extends Enumeration { val None, Origin, OffsetDT, OffsetCal, OffsetInt = Value }
  private lazy val mode: Mode.Value = third.map(_.dataType) match {
    case scala.None                                   => Mode.None
    case Some(dt) if isTs(dt) && isTs(ts.dataType)    => Mode.Origin
    case Some(DateType) if ts.dataType == DateType    => Mode.Origin
    case Some(_: DayTimeIntervalType)                 => Mode.OffsetDT
    case Some(CalendarIntervalType)                   => Mode.OffsetCal
    case Some(dt) if isIntegral(dt) && isIntegral(ts.dataType) => Mode.OffsetInt
    case _                                            => Mode.None // rejected in checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(s"time_bucket: $msg")
    val tsOk = isTs(ts.dataType) || ts.dataType == DateType || isIntegral(ts.dataType)
    if (!tsOk) return fail(s"unsupported time type ${ts.dataType.sql}")
    val widthOk = width.dataType match {
      case _: DayTimeIntervalType | _: YearMonthIntervalType | CalendarIntervalType =>
        isTs(ts.dataType) || ts.dataType == DateType
      case dt if isIntegral(dt) => isIntegral(ts.dataType)
      case _                    => false
    }
    if (!widthOk)
      return fail(s"width ${width.dataType.sql} incompatible with time ${ts.dataType.sql}")
    third match {
      case scala.None => TypeCheckResult.TypeCheckSuccess
      case Some(t) =>
        val ok = t.dataType match {
          case dt if isTs(dt)               => isTs(ts.dataType)
          case DateType                     => ts.dataType == DateType
          case _: DayTimeIntervalType       => isTs(ts.dataType) || ts.dataType == DateType
          case CalendarIntervalType         => isTs(ts.dataType) || ts.dataType == DateType
          case dt if isIntegral(dt)         => isIntegral(ts.dataType)
          case _                            => false
        }
        if (ok) TypeCheckResult.TypeCheckSuccess
        else fail(s"third argument ${t.dataType.sql} must be an origin timestamp/date or interval offset")
    }
  }

  private val U = "graft.expressions.TimeBucketUtil"
  private val SENT = s"${TimeBucketUtil.SENTINEL}L"
  private val SENTI = s"${TimeBucketUtil.SENTINEL_INT}"

  /** Conversion call turning the third argument into the additive offset
    * for the current (time type, mode) — None when it is used directly.
    * Emitted ONCE into a local by [[doGenCode]] (the interpreted evaluator
    * already hoists it); inlining it would re-convert per use, per row.
    */
  private def offsetConvCall(th: String): Option[String] = ts.dataType match {
    case dt if isTs(dt) => mode match {
      case Mode.OffsetCal => Some(s"$U.calOffsetMicros($th)")
      case _              => scala.None
    }
    case DateType => mode match {
      case Mode.OffsetDT  => Some(s"$U.dtOffsetDays($th)")
      case Mode.OffsetCal => Some(s"$U.calOffsetDays($th)")
      case _              => scala.None
    }
    case _ => scala.None
  }

  /** Java source for the bucketed value; `t`, `w` are value variable names;
    * `th` is the origin value or the ALREADY-CONVERTED offset (see
    * [[offsetConvCall]]).
    */
  private def javaExpr(t: String, w: String, th: String): String = ts.dataType match {
    case dt if isTs(dt) =>
      width.dataType match {
        case _: DayTimeIntervalType => mode match {
          case Mode.None      => s"$U.bucketMicros($t, $w, $SENT)"
          case Mode.Origin    => s"$U.bucketMicros($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketMicros($t - $th, $w, $SENT) + $th)"
          case _              => throw new IllegalStateException
        }
        case _: YearMonthIntervalType => mode match {
          case Mode.None      => s"$U.bucketMonthsMicros($t, $w, $SENT)"
          case Mode.Origin    => s"$U.bucketMonthsMicros($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketMonthsMicros($t - $th, $w, $SENT) + $th)"
          case _              => throw new IllegalStateException
        }
        case CalendarIntervalType => mode match {
          case Mode.None      => s"$U.bucketCalendarMicros($t, $w, $SENT)"
          case Mode.Origin    => s"$U.bucketCalendarMicros($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketCalendarMicros($t - $th, $w, $SENT) + $th)"
          case _              => throw new IllegalStateException
        }
        case _ => throw new IllegalStateException
      }
    case DateType =>
      width.dataType match {
        case _: DayTimeIntervalType => mode match {
          case Mode.None      => s"$U.bucketDays($t, $w, $SENTI)"
          case Mode.Origin    => s"$U.bucketDays($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketDays($t - $th, $w, $SENTI) + $th)"
          case _              => throw new IllegalStateException
        }
        case _: YearMonthIntervalType => mode match {
          case Mode.None      => s"$U.bucketMonthsDays($t, $w, $SENTI)"
          case Mode.Origin    => s"$U.bucketMonthsDays($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketMonthsDays($t - $th, $w, $SENTI) + $th)"
          case _              => throw new IllegalStateException
        }
        case CalendarIntervalType => mode match {
          case Mode.None      => s"$U.bucketCalendarDays($t, $w, $SENTI)"
          case Mode.Origin    => s"$U.bucketCalendarDays($t, $w, $th)"
          case Mode.OffsetDT | Mode.OffsetCal =>
            s"($U.bucketCalendarDays($t - $th, $w, $SENTI) + $th)"
          case _              => throw new IllegalStateException
        }
        case _ => throw new IllegalStateException
      }
    case dt => // integral time dimension; all math in long, cast back
      val cast = dt match {
        case LongType    => ""
        case IntegerType => "(int)"
        case ShortType   => "(short)"
        case _           => throw new IllegalStateException
      }
      mode match {
        case Mode.None      => s"$cast$U.bucketLong((long)$t, (long)$w, $SENT)"
        case Mode.OffsetInt => s"$cast($U.bucketLong((long)$t - (long)$th, (long)$w, $SENT) + (long)$th)"
        case _              => throw new IllegalStateException
      }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wGen = width.genCode(ctx)
    val tGen = ts.genCode(ctx)
    val thGen = third.map(_.genCode(ctx))
    val thCode = thGen.map(_.code.toString).getOrElse("")
    val thNull = thGen.map(g => s" || ${g.isNull}").getOrElse("")
    val jt = CodeGenerator.javaType(dataType)
    val thVal = thGen.map(_.value.toString).getOrElse("")
    val conv = offsetConvCall(thVal)
    val offVar = conv.map(_ => ctx.freshName("tbOff"))
    val offDecl = (conv, offVar) match {
      case (Some(c), Some(v)) =>
        val t = if (ts.dataType == DateType) "int" else "long"
        s"$t $v = $c;"
      case _ => ""
    }
    val expr = javaExpr(tGen.value.toString, wGen.value.toString,
      offVar.getOrElse(thVal))
    ev.copy(code = code"""
      ${wGen.code}
      ${tGen.code}
      $thCode
      boolean ${ev.isNull} = ${wGen.isNull} || ${tGen.isNull}$thNull;
      $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        $offDecl
        ${ev.value} = $expr;
      }""")
  }

  override def eval(input: InternalRow): Any = {
    val w = width.eval(input); if (w == null) return null
    val t = ts.eval(input); if (t == null) return null
    val th = if (third.isDefined) {
      val v = third.get.eval(input); if (v == null) return null; v
    } else null
    evaluator(t, w, th)
  }

  /** Interpreted mirror of [[javaExpr]]. */
  private lazy val evaluator: (Any, Any, Any) => Any = {
    import TimeBucketUtil._
    def lng(a: Any): Long = a.asInstanceOf[Number].longValue()
    ts.dataType match {
      case dt if isTs(dt) =>
        width.dataType match {
          case _: DayTimeIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketMicros(lng(t), lng(w), SENTINEL)
            case Mode.Origin   => (t, w, th) => bucketMicros(lng(t), lng(w), lng(th))
            case Mode.OffsetDT => (t, w, th) => bucketMicros(lng(t) - lng(th), lng(w), SENTINEL) + lng(th)
            case _ => (t, w, th) => {
              val off = calOffsetMicros(th.asInstanceOf[CalendarInterval])
              bucketMicros(lng(t) - off, lng(w), SENTINEL) + off
            }
          }
          case _: YearMonthIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketMonthsMicros(lng(t), w.asInstanceOf[Int], SENTINEL)
            case Mode.Origin   => (t, w, th) => bucketMonthsMicros(lng(t), w.asInstanceOf[Int], lng(th))
            case Mode.OffsetDT => (t, w, th) => bucketMonthsMicros(lng(t) - lng(th), w.asInstanceOf[Int], SENTINEL) + lng(th)
            case _ => (t, w, th) => {
              val off = calOffsetMicros(th.asInstanceOf[CalendarInterval])
              bucketMonthsMicros(lng(t) - off, w.asInstanceOf[Int], SENTINEL) + off
            }
          }
          case CalendarIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketCalendarMicros(lng(t), w.asInstanceOf[CalendarInterval], SENTINEL)
            case Mode.Origin   => (t, w, th) => bucketCalendarMicros(lng(t), w.asInstanceOf[CalendarInterval], lng(th))
            case Mode.OffsetDT => (t, w, th) => bucketCalendarMicros(lng(t) - lng(th), w.asInstanceOf[CalendarInterval], SENTINEL) + lng(th)
            case _ => (t, w, th) => {
              val off = calOffsetMicros(th.asInstanceOf[CalendarInterval])
              bucketCalendarMicros(lng(t) - off, w.asInstanceOf[CalendarInterval], SENTINEL) + off
            }
          }
          case _ => throw new IllegalStateException
        }
      case DateType =>
        def di(a: Any): Int = a.asInstanceOf[Int]
        width.dataType match {
          case _: DayTimeIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketDays(di(t), lng(w), SENTINEL_INT)
            case Mode.Origin   => (t, w, th) => bucketDays(di(t), lng(w), di(th))
            case Mode.OffsetDT => (t, w, th) => {
              val od = dtOffsetDays(lng(th)); bucketDays(di(t) - od, lng(w), SENTINEL_INT) + od
            }
            case _ => (t, w, th) => {
              val od = calOffsetDays(th.asInstanceOf[CalendarInterval])
              bucketDays(di(t) - od, lng(w), SENTINEL_INT) + od
            }
          }
          case _: YearMonthIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketMonthsDays(di(t), w.asInstanceOf[Int], SENTINEL_INT)
            case Mode.Origin   => (t, w, th) => bucketMonthsDays(di(t), w.asInstanceOf[Int], di(th))
            case Mode.OffsetDT => (t, w, th) => {
              val od = dtOffsetDays(lng(th)); bucketMonthsDays(di(t) - od, w.asInstanceOf[Int], SENTINEL_INT) + od
            }
            case _ => (t, w, th) => {
              val od = calOffsetDays(th.asInstanceOf[CalendarInterval])
              bucketMonthsDays(di(t) - od, w.asInstanceOf[Int], SENTINEL_INT) + od
            }
          }
          case CalendarIntervalType => mode match {
            case Mode.None     => (t, w, _) => bucketCalendarDays(di(t), w.asInstanceOf[CalendarInterval], SENTINEL_INT)
            case Mode.Origin   => (t, w, th) => bucketCalendarDays(di(t), w.asInstanceOf[CalendarInterval], di(th))
            case Mode.OffsetDT => (t, w, th) => {
              val od = dtOffsetDays(lng(th))
              bucketCalendarDays(di(t) - od, w.asInstanceOf[CalendarInterval], SENTINEL_INT) + od
            }
            case _ => (t, w, th) => {
              val od = calOffsetDays(th.asInstanceOf[CalendarInterval])
              bucketCalendarDays(di(t) - od, w.asInstanceOf[CalendarInterval], SENTINEL_INT) + od
            }
          }
          case _ => throw new IllegalStateException
        }
      case dt =>
        val box: Long => Any = dt match {
          case LongType    => identity _
          case IntegerType => (v: Long) => v.toInt
          case ShortType   => (v: Long) => v.toShort
          case _           => throw new IllegalStateException
        }
        mode match {
          case Mode.None      => (t, w, _) => box(bucketLong(lng(t), lng(w), SENTINEL))
          case Mode.OffsetInt => (t, w, th) => box(bucketLong(lng(t) - lng(th), lng(w), SENTINEL) + lng(th))
          case _              => throw new IllegalStateException
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    if (newChildren.length == 2) copy(width = newChildren(0), ts = newChildren(1), third = None)
    else copy(width = newChildren(0), ts = newChildren(1), third = Some(newChildren(2)))
}

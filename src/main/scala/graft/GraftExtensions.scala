package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** `SparkSessionExtensions` entry point — enables
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), the idiomatic analogue
  * of the reference's planner-hook installation
  * (`src/planner/planner.c:2165-2168`): SQL functions plus the
  * sort-transform optimizer rule land on every session built with it.
  * [[Graft.init]] applies the same registrations to an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // gapfill rewrites at RESOLUTION time so empty-bucket aggregates keep
    // reference NULL semantics (nullability can still widen); the optimizer
    // registration below is the no-op-unless-unrewritten fallback shared
    // with Graft.init sessions
    ext.injectResolutionRule(_ => graft.plans.GapfillResolution)
    ext.injectOptimizerRule(_ => graft.plans.GapfillRewrite)
    ext.injectOptimizerRule(_ => graft.plans.SortTransform)
    ext.injectOptimizerRule(_ => graft.plans.CaggRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ChunkExclusion)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
  }
}

object GraftExtensions {

  /** A resolved string argument in a time position is a UUIDv7: bucket its
    * embedded timestamp (micros-exact round-trip).
    */
  private def uuidTs(t: Expression): Expression =
    if (t.resolved && t.dataType == org.apache.spark.sql.types.StringType)
      UuidTimestamp(t, withMicros = true)
    else t

  /** Shared with [[Graft.init]] so both registration paths agree. */
  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "time_bucket" -> {
      // uuid overloads (`sql/time_bucket.sql:18-19,29,45` — time_bucket over
      // a UUIDv7 buckets its embedded timestamp): a string ts is treated as
      // a v7 uuid, like the reference's UUID signatures
      case Seq(w, t)    => TimeBucket(w, uuidTs(t), None)
      case Seq(w, t, o) => TimeBucket(w, uuidTs(t), Some(o))
      case exprs => throw new IllegalArgumentException(
        s"time_bucket requires 2 or 3 arguments, got ${exprs.length}")
    },
    // bucket in the wall-clock of tz, result back as a UTC instant
    // (reference `src/time_bucket.c:335+` timestamptz-with-timezone form)
    "time_bucket_tz" -> {
      case Seq(w, t, tz) =>
        org.apache.spark.sql.catalyst.expressions.ToUTCTimestamp(
          TimeBucket(w,
            org.apache.spark.sql.catalyst.expressions.FromUTCTimestamp(t, tz), None), tz)
      case exprs => throw new IllegalArgumentException(
        s"time_bucket_tz requires (width, ts, timezone), got ${exprs.length} arguments")
    },
    "to_uuidv7" -> { case Seq(e) => ToUuidV7(e, boundary = false) },
    "to_uuidv7_boundary" -> { case Seq(e) => ToUuidV7(e, boundary = true) },
    "uuid_timestamp" -> { case Seq(e) => UuidTimestamp(e, withMicros = false) },
    "uuid_timestamp_micros" -> { case Seq(e) => UuidTimestamp(e, withMicros = true) },
    "uuid_version" -> { case Seq(e) => UuidVersion(e) },
    "generate_uuidv7" -> { case Seq() => GenerateUuidV7() },
    "simhash64" -> { case Seq(e) => SimHash64(e) },
    "dot_product" -> { case Seq(a, b) => DotProduct(a, b) },
    "minhash_sig" -> {
      case Seq(toks, n, k) =>
        def intOf(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
          case _ => throw new IllegalArgumentException(s"minhash_sig: $what must be a literal int")
        }
        MinHashSig(toks, intOf(n, "shingle n"), intOf(k, "num hashes"))
      case exprs => throw new IllegalArgumentException(
        s"minhash_sig takes (tokens, n, k), got ${exprs.length} arguments")
    },
    "time_bucket_gapfill" -> {
      case Seq(w, t) => // window inferred from the WHERE clause
        val nul = org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.TimestampType)
        GapfillBucket(w, t, nul, nul)
      case Seq(w, t, s, f) => GapfillBucket(w, t, s, f)
      case exprs => throw new IllegalArgumentException(
        s"time_bucket_gapfill takes (width, ts [, start, finish]), got ${exprs.length} arguments")
    },
    "locf" -> {
      case Seq(e)    => Locf(e, None)
      case Seq(e, p) => Locf(e, Some(p))
      case Seq(e, p, t) => Locf(e, Some(p),
        t.eval().asInstanceOf[Boolean])
    },
    "interpolate" -> { case Seq(e) => Interpolate(e) })
}

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
    "interpolate" -> { case Seq(e) => Interpolate(e) },

    // bookends (`src/agg_bookend.c:29-33`): first(value, time) /
    // last(value, time) are the reference's aggregates. Shadowing the
    // builtin names must stay transparent for BUILTIN call shapes — and in
    // Spark 4 even the Column API (`functions.last(e, ignoreNulls)`)
    // resolves "last" by NAME through this registry — so the dispatch is
    // on the second argument: a boolean LITERAL is the builtin's
    // ignoreNulls flag, anything else is the reference's time column
    // (ordering by a boolean literal is meaningless, so the shapes are
    // disjoint in practice).
    "first" -> {
      case Seq(v) => org.apache.spark.sql.catalyst.expressions.aggregate
        .First(v, ignoreNulls = false).toAggregateExpression()
      case Seq(v, b) if isBoolLit(b) =>
        org.apache.spark.sql.catalyst.expressions.aggregate
          .First(v, b.eval(null).asInstanceOf[Boolean]).toAggregateExpression()
      case Seq(v, t) => org.apache.spark.sql.catalyst.expressions.aggregate
        .MinBy(v, t).toAggregateExpression()
    },
    "last" -> {
      case Seq(v) => org.apache.spark.sql.catalyst.expressions.aggregate
        .Last(v, ignoreNulls = false).toAggregateExpression()
      case Seq(v, b) if isBoolLit(b) =>
        org.apache.spark.sql.catalyst.expressions.aggregate
          .Last(v, b.eval(null).asInstanceOf[Boolean]).toAggregateExpression()
      case Seq(v, t) => org.apache.spark.sql.catalyst.expressions.aggregate
        .MaxBy(v, t).toAggregateExpression()
    },

    // histogram (`sql/histogram.sql:5-28`): nbuckets+2 array with
    // under/overflow ends; bucket rule floor((v-min)/w)+1 (histogram.c:49+)
    "histogram_bucket" -> {
      case Seq(v, mn, mx, nb) => histogramBucketExpr(v, mn, mx, nb)
    },
    "histogram" -> {
      case Seq(v, mn, mx, nb) =>
        import org.apache.spark.sql.catalyst.expressions._
        val n = litInt(nb, "nbuckets")
        val idx = histogramBucketExpr(v, mn, mx, nb)
        CreateArray((0 to n + 1).map(i =>
          aggregate.Sum(If(EqualTo(idx, Literal(i)), Literal(1L), Literal(0L)))
            .toAggregateExpression()))
    },

    // single-pass text analysis (library defaults for markers/stopwords)
    "lang_id" -> { case Seq(e) =>
      LangId(e, graft.operators.TextAnalysis.LANG_MARKERS) },
    "quality_score" -> { case Seq(e) =>
      QualityScore(e, graft.operators.TextAnalysis.STOPWORDS_EN) },
    "normalize_text" -> { case Seq(e) => NormalizeText(e) },
    "word_ngrams" -> {
      case Seq(toks, n) => WordNGrams(toks, n match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
        case _ => throw new IllegalArgumentException("word_ngrams: n must be a literal int")
      })
    })

  private def isBoolLit(e: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(_,
      org.apache.spark.sql.types.BooleanType) => true
    case _ => false
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    // SQL numeric literals arrive as Int/Long/Double/Decimal Literals
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null => v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number                             => n.doubleValue()
      case _ => throw new IllegalArgumentException(s"histogram: $what must be numeric")
    }
    case _ => throw new IllegalArgumentException(s"histogram: $what must be a literal")
  }

  private def litInt(e: Expression, what: String): Int = litDouble(e, what).toInt

  private def histogramBucketExpr(v: Expression, mn: Expression, mx: Expression,
      nb: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val min = litDouble(mn, "min")
    val max = litDouble(mx, "max")
    val n = litInt(nb, "nbuckets")
    val w = (max - min) / n
    val vd = Cast(v, DoubleType)
    If(LessThan(vd, Literal(min)), Literal(0),
      If(GreaterThanOrEqual(vd, Literal(max)), Literal(n + 1),
        Add(Cast(Floor(Divide(Subtract(vd, Literal(min)), Literal(w))),
          IntegerType), Literal(1))))
  }
}

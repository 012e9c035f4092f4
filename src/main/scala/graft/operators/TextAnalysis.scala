package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All are
  * pure column expressions (codegen'd, no UDFs) and every formula is
  * portable SQL so the DuckDB oracle can replicate it bit-for-bit.
  */
object TextAnalysis {

  /** Corpus n-gram statistics: total occurrences and document frequency
    * per word n-gram — the exact-integer building blocks of TF-IDF / LM
    * corpus stats (the float weighting is left to the consumer: `ln` is
    * not IEEE-exact across engines, counts are). Shingle formulation
    * matches [[graft.operators.Dedup.shingles]] minus the distinct (counts
    * need multiplicity). Scale: explode → one partial/final aggregation on
    * the gram; `minCount` prunes the long tail BEFORE any sort.
    */
  def ngramStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int, minCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val grams = org.apache.spark.sql.GraftShims.toColumn(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.GraftShims.toExpression(toks), n))
    df.select(col(idCol), explode(grams).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_total"), count_distinct(col(idCol)).as("n_docs"))
      .where(col("n_total") >= minCount)
  }

  /** Whitespace token count of the trimmed text — single-pass codegen
    * expression (round 13: the column form materialized the full token
    * ARRAY per row just to take its size; q11 at the sf1 point was
    * dominated by it).
    */
  def token_count(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.TokenCount(
      org.apache.spark.sql.GraftShims.toExpression(text)))

  /** The original column formulation — the reference [[token_count]] must
    * match bit-for-bit (spec-pinned).
    */
  def token_count_columns(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish piece count: alpha runs, digit runs, and single punctuation
    * marks each count as one piece — single-pass codegen expression.
    */
  val SUBWORD_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def subword_count(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.SubwordCount(
      org.apache.spark.sql.GraftShims.toExpression(text)))

  /** The original regex formulation — the reference [[subword_count]]
    * must match exactly (spec-pinned).
    */
  def subword_count_columns(text: Column): Column =
    regexp_count(text, lit(SUBWORD_PATTERN))

  /** Simple quality features + score in [0,1]:
    * 0.5·min(tokens/50,1) + 0.3·(1 − punct/chars) + 0.2·min(5·stopdensity,1).
    * Deliberately expressible in ANSI SQL (same arithmetic order).
    */
  val STOPWORDS_EN = Seq("the", "a", "of", "to", "and", "in", "is", "it")
  def stopword_count(text: Column): Column =
    regexp_count(lower(text), lit("\\b(" + STOPWORDS_EN.mkString("|") + ")\\b"))
  def punct_count(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Single-pass expression (see [[graft.expressions.QualityScore]] for
    * the count equivalences); the column pieces below remain for callers
    * wanting individual features.
    */
  def quality_score(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.QualityScore(
      org.apache.spark.sql.GraftShims.toExpression(text), STOPWORDS_EN))

  /** The score as composed column expressions — the reference formula the
    * single-pass expression must reproduce bit-for-bit (spec-pinned).
    */
  def quality_score_columns(text: Column): Column = {
    val toks = token_count(text).cast("double")
    val chars = greatest(length(text), lit(1)).cast("double")
    val punct = punct_count(text).cast("double")
    val stop = stopword_count(text).cast("double")
    lit(0.5) * least(toks / 50.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - punct / chars) +
      lit(0.2) * least(stop * 5.0 / greatest(toks, lit(1.0)), lit(1.0))
  }

  /** n-gram-heuristic language ID: marker-word hit counts per language,
    * argmax with a fixed tie order (en > fr > de > es), 'und' if no hits.
    */
  val LANG_MARKERS: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "por", "con"))

  def lang_score(text: Column, lang: String): Column = {
    val words = LANG_MARKERS.toMap.apply(lang)
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))
  }

  /** Single-pass expression: the per-language `regexp_count` when-chain
    * re-evaluated each count up to 4x (16 regex passes/row); see
    * [[graft.expressions.LangId]] for the equivalence argument.
    */
  def lang_id(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.LangId(
      org.apache.spark.sql.GraftShims.toExpression(text), LANG_MARKERS))

  /** Canonical normalization (NFC + whitespace collapse/trim + simple
    * lowercase) in one pass — see [[graft.expressions.NormalizeText]].
    */
  def normalize_text(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.NormalizeText(
      org.apache.spark.sql.GraftShims.toExpression(text)))

  /** All word n-grams of the text, WITH multiplicity (single-pass
    * expression — [[graft.expressions.WordNGrams]]).
    */
  def word_ngrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.WordNGrams(
      org.apache.spark.sql.GraftShims.toExpression(split(trim(text), "\\s+")), n))

  /** Within-document repetition metrics (the Gopher-style repetition
    * filters): total vs distinct word n-grams and the duplicate fraction
    * `1 − distinct/total` — high values flag boilerplate/spam documents
    * that near-dup CROSS-document passes don't see. Pure column
    * expressions over one shingle array; at corpus scale this is a single
    * narrow scan, no shuffle at all.
    */
  def repetition_stats(text: Column, n: Int): Column = {
    val grams = word_ngrams(text, n)
    val total = size(grams)
    val distinctN = size(array_distinct(grams))
    struct(
      total.cast("long").as("n_grams"),
      distinctN.cast("long").as("n_distinct"),
      when(total === 0, lit(0.0))
        .otherwise(lit(1.0) - distinctN.cast("double") / total.cast("double"))
        .as("dup_fraction"))
  }

  /** Benchmark-contamination check (training-set decontamination): for
    * each document, how many of its distinct word n-grams appear in ANY
    * benchmark document, and the contaminated fraction. One explode + one
    * hash join on the gram + one aggregation; the benchmark shingle set is
    * broadcast (eval benchmarks are ~10⁶ grams — fits every executor),
    * so the corpus side never shuffles its full shingle explosion.
    */
  def contamination(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, benchmark: org.apache.spark.sql.DataFrame,
      benchTextCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val bset = benchmark
      .select(explode(array_distinct(word_ngrams(col(benchTextCol), n))).as("gram"))
      .distinct()
      .withColumn("_hit", lit(1))
    df.select(col(idCol), array_distinct(word_ngrams(col(textCol), n)).as("_sh"))
      .select(col(idCol), size(col("_sh")).cast("long").as("n_shingles"),
        explode_outer(col("_sh")).as("gram"))
      .join(broadcast(bset), Seq("gram"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("_hit")).as("n_shared"))
      .withColumn("contaminated_frac",
        col("n_shared").cast("double") / greatest(col("n_shingles"), lit(1)).cast("double"))
  }

  /** Whitespace-normalized lowercase md5 fingerprint — engine-portable
    * exact-dup key.
    */
  def fingerprint_md5(text: Column): Column =
    md5(lower(regexp_replace(text, lit("\\s+"), lit(" "))))

  /** 64-bit rolling-hash fingerprint (FNV-1a over the normalized text) —
    * cheaper than md5 for shingle/winnowing pipelines; Spark-side only.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(text, lit("\\s+"), lit(" "))))

  /** Sequence packing for training-data pipelines (the standard
    * concat-then-chop formulation: documents are concatenated in a
    * deterministic order and the token stream is chopped into fixed
    * `windowTokens` windows). Emits one row per document with its
    * placement: `start_tok` (exclusive prefix sum of token counts),
    * `window_id` (the window its first token lands in), and
    * `crosses_boundary` (the document spans a chop point — pipelines that
    * forbid splits re-route these).
    *
    * Scale shape: the running sum is windowed PER `shardCol` group (e.g.
    * the corpus source) ordered by `idCol` — shards pack independently and
    * in parallel, so no global single-task prefix sum exists anywhere; at
    * 100 TB the shard is the parallelism unit exactly like a training
    * run's per-source data mix.
    */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shardCol: String,
      windowTokens: Int): org.apache.spark.sql.DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val n = token_count(col(textCol)).cast("long")
    df.select(col(idCol), col(shardCol), n.as("n_tokens"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer division throughout (exact at any corpus size; double
      // division would wobble past 2^53 tokens). The n_tokens > 0 guard
      // keeps the numerator non-negative — trunc-vs-floor division of a
      // -1 numerator is the one place engines disagree.
      .withColumn("window_id", expr(s"start_tok div $windowTokens"))
      .withColumn("crosses_boundary", col("n_tokens") > 0 &&
        expr(s"(start_tok + n_tokens - 1) div $windowTokens") > col("window_id"))
  }

  /** PII redaction patterns, applied in order: (kind, regex, replacement).
    * Patterns are deliberately restricted to syntax with identical
    * semantics in Java regex and RE2 (no lookaround, ASCII classes, `\b`)
    * so an engine-portable oracle can verify the redaction byte-for-byte.
    * Email precedes IPv4 (an all-alpha TLD keeps the two disjoint, but a
    * dotted-quad inside an already-redacted token must not resurface);
    * replacements contain no digits, so later passes can never match
    * inside earlier replacements. SSN (3-2-4) and US phone (3-3-4) groups
    * are length-disjoint.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone_us", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  private def piiScan(text: Column, kinds: Seq[String]): Column = {
    val unknown = kinds.filterNot(k => piiPatterns.exists(_._1 == k))
    require(unknown.isEmpty, s"unknown PII kind(s): ${unknown.mkString(",")}")
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.PiiScan(
      org.apache.spark.sql.GraftShims.toExpression(text), kinds))
  }

  /** Redact the selected PII kinds in one single-pass expression
    * ([[graft.expressions.PiiScan]] — hand-rolled scanners, no regex
    * engine; [[redact_pii_columns]] is the 4-chained-`regexp_replace`
    * reference it reproduces, spec-pinned). Still embarrassingly parallel
    * and codegen-fused at 100 TB; when paired with [[pii_counts]] over the
    * same text, Spark's subexpression elimination runs the scan ONCE.
    */
  def redact_pii(text: Column,
      kinds: Seq[String] = piiPatterns.map(_._1)): Column =
    piiScan(text, kinds).getField("redacted")

  /** Per-kind PII match counts (for filtering/reporting pipelines) as a
    * struct with one field per kind in [[piiPatterns]] order — counted
    * over the original text, like the independent `regexp_count` columns
    * ([[pii_counts_columns]]).
    */
  def pii_counts(text: Column): Column = {
    val scan = piiScan(text, piiPatterns.map(_._1))
    struct(piiPatterns.map { case (kind, _, _) =>
      scan.getField(s"n_$kind").as(s"n_$kind")
    }: _*)
  }

  /** The chained-regex formulations the single-pass expression reproduces
    * byte-for-byte (spec-pinned in PipelineOpsSpec).
    */
  def redact_pii_columns(text: Column,
      kinds: Seq[String] = piiPatterns.map(_._1)): Column =
    piiPatterns.filter(p => kinds.contains(p._1)).foldLeft(text) {
      case (c, (_, pat, repl)) => regexp_replace(c, lit(pat), lit(repl))
    }

  def pii_counts_columns(text: Column): Column =
    struct(piiPatterns.map { case (kind, pat, _) =>
      regexp_count(text, lit(pat)).as(s"n_$kind")
    }: _*)

  // ------------------------------------- hashed-bigram LM quality scoring

  /** Train a hashed-bigram language model on the rows where `isTarget`
    * (CCNet's quality signal, Wenzek et al. 2020: score documents by LM
    * fit against a clean corpus): tokens hash to `buckets` ids
    * ([[Sampling.tokenBuckets]] arithmetic), bigram and unigram counts
    * aggregate in ONE B²-bounded shuffle, and the add-1-smoothed log-prob
    * table `ln((c2[p,c]+1)/(c1[p]+B))` comes back as one dense B×B
    * Array[Double] (B=256 → 512 KB on the driver, like the IVF centroids).
    * At 100 TB the counts pass is a full text scan — train on a
    * [[Sampling.bernoulli]] sample; the model needs millions of tokens,
    * not all of them.
    */
  def lmTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      isTarget: Column, buckets: Int = 256): Array[Double] = {
    require(buckets >= 2 && buckets <= 2048,
      "lmTrain: buckets must be in [2, 2048] (dense B^2 driver table)")
    val tb = Sampling.tokenBuckets(col(textCol), buckets)
    // bigram key = prev*B + cur, from each doc's bucket sequence in order
    val counts = df.where(isTarget)
      .select(tb.as("_b"))
      .where(size(col("_b")) >= 2)
      .select(explode(zip_with(
        slice(col("_b"), lit(1), size(col("_b")) - 1),
        slice(col("_b"), lit(2), size(col("_b")) - 1),
        (p, c) => p * buckets + c)).as("_k"))
      .groupBy("_k").agg(count(lit(1)).as("n"))
      .collect() // bounded: <= buckets^2 rows
    val c2 = new Array[Long](buckets * buckets)
    counts.foreach(r => c2(r.getInt(0)) = r.getLong(1))
    val c1 = new Array[Long](buckets)
    var k = 0
    while (k < c2.length) { c1(k / buckets) += c2(k); k += 1 }
    val lam = new Array[Double](buckets * buckets)
    k = 0
    while (k < lam.length) {
      lam(k) = math.log((c2(k) + 1L).toDouble /
        (c1(k / buckets) + buckets).toDouble)
      k += 1
    }
    lam
  }

  /** Total log-probability of `text` under a [[lmTrain]]ed model — higher
    * is more target-like; divide by (token_count − 1) for a length-free
    * quality score (CCNet filters on exactly this). Null for docs with
    * fewer than 2 tokens. Single-pass codegen expression; the table rides
    * in the expression, never the plan.
    */
  def lm_score(text: Column, model: Array[Double], buckets: Int = 256): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.BigramLmScore(
      org.apache.spark.sql.GraftShims.toExpression(
        Sampling.tokenBuckets(text, buckets)),
      model, buckets))

  // --------------------------------------------------- Gopher quality rules

  /** The Gopher corpus-quality rule set (Rae et al. 2021, Table A1) as one
    * struct of features + per-rule flags + the conjunction: word-count
    * bounds, mean word length bounds, symbol-to-word ratio, alphabetic-word
    * fraction, and stop-word evidence. Every feature is an exact integer or
    * a single integer division — engine-portable for the oracle.
    *
    * Single-pass expression ([[graft.expressions.GopherFeatures]] — two
    * linear walks, no regex engine); [[gopher_rules_columns]] is the
    * ~6-scan regex formulation it must reproduce bit-for-bit
    * (spec-pinned in PipelineOpsSpec).
    */
  def gopher_rules(text: Column): Column =
    org.apache.spark.sql.GraftShims.toColumn(graft.expressions.GopherFeatures(
      org.apache.spark.sql.GraftShims.toExpression(text), STOPWORDS_EN))

  /** The rule set as composed column expressions — the reference formula
    * the single-pass expression reproduces.
    */
  def gopher_rules_columns(text: Column): Column = {
    val toks = token_count(text)
    val nChars = length(regexp_replace(trim(text), "\\s+", ""))
    val meanWordLen = when(toks > 0, nChars.cast("double") / toks.cast("double"))
    val nSymbols = regexp_count(text, lit("#|\\.\\.\\."))
    val symbolRatio = when(toks > 0, nSymbols.cast("double") / toks.cast("double"))
    val nAlphaWords = size(filter(split(trim(text), "\\s+"),
      w => w.rlike("[A-Za-z]")))
    val alphaFrac = when(toks > 0, nAlphaWords.cast("double") / toks.cast("double"))
    val nStop = stopword_count(text)
    val passWords = toks >= 50 && toks <= 100000
    val passWordLen = meanWordLen >= 3.0 && meanWordLen <= 10.0
    val passSymbols = symbolRatio <= 0.1
    val passAlpha = alphaFrac >= 0.8
    val passStop = nStop >= 2
    struct(
      toks.as("n_words"), meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      nStop.cast("long").as("n_stopwords"),
      passWords.as("pass_word_count"), passWordLen.as("pass_word_length"),
      passSymbols.as("pass_symbol_ratio"), passAlpha.as("pass_alpha_frac"),
      passStop.as("pass_stopwords"),
      (passWords && passWordLen && passSymbols && passAlpha && passStop)
        .as("pass_gopher"))
  }
}

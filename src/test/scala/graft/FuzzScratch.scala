package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** One-off heavy fuzz of the round-5 hand-rolled scanners against their
  * regex/column formulations (Test scope, not part of the library).
  * Run: `sbt "Test/runMain graft.FuzzScratch [n]"`.
  */
object FuzzScratch {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = Graft.session("fuzz-scratch", "local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // generator biased toward pattern-shaped fragments: digits runs,
    // dots, dashes, '@', TLD-ish tails, word boundaries, unicode
    val frags = Array(
      "@", ".", "-", "_", "%", "+", " ", "\t", "\n", "#", "...", "..",
      "a", "ab", "xyz", "com", "org", "co", "c", "1", "12", "123", "1234",
      "255", "10", "0", "the", "and", "of", "it", "is", "in", "b.c", "le", "der", "el",
      "user", "example", "ssn", "€", "😀", "K", "１２３", "é",
      "test@", "@test", ".com", "a@b", "1.2", "3.4", "-45-", "-6789",
      "555-", "867-5309", "123-45-6789", "10.0.0.7", "e@x.io")
    def gen(): String = {
      val len = 1 + rnd.nextInt(30)
      val sb = new StringBuilder
      var i = 0
      while (i < len) { sb.append(frags(rnd.nextInt(frags.length))); i += 1 }
      sb.toString
    }
    val rows = (0 until n).map(i => (i.toLong, gen())).toDF("id", "text")
      .repartition(32).localCheckpoint()

    // PII: fused scanner vs chained regex, byte-for-byte
    val pii = rows.select($"id", $"text",
      TextAnalysis.redact_pii($"text").as("er"),
      TextAnalysis.redact_pii_columns($"text").as("cr"),
      TextAnalysis.pii_counts($"text").as("ec"),
      TextAnalysis.pii_counts_columns($"text").as("cc"))
    val piiBad = pii.where(!($"er" <=> $"cr") ||
      !($"ec.n_email" <=> $"cc.n_email") || !($"ec.n_ipv4" <=> $"cc.n_ipv4") ||
      !($"ec.n_ssn" <=> $"cc.n_ssn") || !($"ec.n_phone_us" <=> $"cc.n_phone_us"))
    val nPii = piiBad.count()
    println(s"[fuzz] pii divergences: $nPii / $n")
    piiBad.select("text", "er", "cr").show(5, truncate = false)

    // Gopher: fused expression vs regex columns, field-exact
    val g = rows.select($"id", $"text",
      TextAnalysis.gopher_rules($"text").as("e"),
      TextAnalysis.gopher_rules_columns($"text").as("c"))
    val fields = Seq("n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
      "n_stopwords", "pass_word_count", "pass_word_length",
      "pass_symbol_ratio", "pass_alpha_frac", "pass_stopwords", "pass_gopher")
    val gBad = g.where(fields.map(f => !(col(s"e.$f") <=> col(s"c.$f")))
      .reduce(_ || _))
    val nG = gBad.count()
    println(s"[fuzz] gopher divergences: $nG / $n")
    gBad.select("text").show(5, truncate = false)

    // quality_score vs its column formulation, bitwise
    val q = rows.select($"text",
      TextAnalysis.quality_score($"text").as("f"),
      TextAnalysis.quality_score_columns($"text").as("r"))
    val nQ = q.where(!($"f" <=> $"r")).count()
    println(s"[fuzz] quality divergences: $nQ / $n")
    q.where(!($"f" <=> $"r")).show(5, truncate = false)

    // lang_id vs the per-language regexp_count argmax
    val markers = TextAnalysis.LANG_MARKERS
    val l = rows.select(($"text" +: TextAnalysis.lang_id($"text").as("fused") +:
      markers.map { case (lg, _) => TextAnalysis.lang_score($"text", lg).as(lg) }): _*)
    val expectedExpr = {
      val counts = markers.map { case (lg, _) => col(lg) }
      val total = counts.reduce(_ + _)
      val mx = greatest(counts: _*)
      when(total === 0, lit("und")).otherwise(
        markers.foldRight(lit("?")) { case ((lg, _), acc) =>
          when(col(lg) === mx, lit(lg)).otherwise(acc)
        })
    }
    // foldRight gives FIRST-wins tie order (en checked first)
    val nL = l.where(!($"fused" <=> expectedExpr)).count()
    println(s"[fuzz] lang divergences: $nL / $n")

    // shingle-hash jaccard vs string jaccard on consecutive-id pairs
    val sets = rows.select($"id",
      Dedup.shingles($"text", 2).as("ss"), Dedup.shingleHashes($"text", 2).as("hs"))
    val a = sets.select($"id".as("ia"), $"ss".as("sa"), $"hs".as("ha"))
    val b = sets.select(($"id" - 1).as("ia"), $"ss".as("sb"), $"hs".as("hb"))
    val j = a.join(b, "ia").select(
      Dedup.jaccard($"sa", $"sb").as("js"), Dedup.jaccardHashed($"ha", $"hb").as("jh"))
    val nJ = j.where(!($"js" <=> $"jh")).count()
    println(s"[fuzz] jaccard divergences: $nJ")

    require(nPii == 0 && nG == 0 && nJ == 0 && nQ == 0 && nL == 0,
      "FUZZ FOUND DIVERGENCES")
    println("[fuzz] all clean")
    spark.stop()
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for the training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars). Beyond the
  * reference's surface (it has none of these) — part of the north-star
  * extension set (BASELINE.json).
  *
  * Everything is built from codegen'd built-ins + higher-order functions —
  * no UDFs — so each query is one whole-stage-codegen'd scan: at 100 TB
  * these run at parquet-read speed with zero shuffles (except noted).
  */
object TextAnalysis {

  /** Whitespace tokenizer shared by all text ops. */
  val tokens: Column = split(trim(col("text")), "\\s+")

  private[text] val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private[text] def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** GPT-2-style pre-tokenization regex, restricted to constructs with
    * identical semantics in Java regex and RE2 (DuckDB): contraction
    * suffixes, space-prefixed letter/digit runs, punctuation runs. ASCII
    * classes only — Unicode property classes differ across engines. */
  val BpePattern: String =
    // Control chars are excluded from the punctuation class (ADVICE
    // r13): U+001F is not \s, and BpeTrainer.tokenizeDocs joins pieces
    // with U+001F — a control char inside a piece would silently break
    // the reconstructable-sequence contract. Both engines share this
    // constant, so the exclusion is parity-neutral.
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9\\x00-\\x1f]+"

  /** Token counting: whitespace tokens, a BPE-ish regex piece count
    * (pre-tokenizer matches — the unit a subword tokenizer would then
    * split), and the chars/4 LLM heuristic. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens)
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .as("n_bpe_pieces"),
        length(col("text")).as("n_chars_text"),
        (length(col("text")) / lit(4)).cast("int").as("n_subwords_est"))
      .orderBy("doc_id")

  /** Tokenizer fertility by (lang, source) — the cost model a budget
    * planner reads before committing a token budget: BPE-ish pieces
    * per whitespace word (fertility — how much a subword tokenizer
    * inflates each language) and characters per piece (compression).
    * High-fertility slices burn budget faster than their word counts
    * suggest; this is the per-slice exchange rate. One codegen'd scan,
    * exact integer sums, two final divisions. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(tokens).cast("long").as("w"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("b"),
        length(col("text")).cast("long").as("c"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("b")).as("n_pieces"),
        sum(col("c")).as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_words"), col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_words"))
          .as("pieces_per_word"),
        (col("n_chars").cast("double") / col("n_pieces"))
          .as("chars_per_piece"))
      .orderBy("lang", "source")

  /** The judge's quality formula over (n_tokens, stop_hits): length prior
    * × (1 − stopword density), rounded to 6 places for oracle parity.
    * THE one definition — qualityScore emits it as the per-doc double and
    * [[QualityModel.featFrameOf]] scales it to the micro-unit distillation
    * label, so the distilled gate can never drift from the judge it claims
    * to distill (ADVICE r12: two inlined copies would drift together and
    * silently invalidate the gate-agreement eval). */
  private[text] def qualityExpr(nTokens: Column, stopHits: Column): Column =
    round(least(nTokens.cast("double") / lit(100.0), lit(1.0)) *
      (lit(1.0) - stopHits.cast("double") / nTokens), 6)

  /** Quality scoring: length prior × (1 − stopword density), plus the raw
    * component signals. All arithmetic double, rounded for oracle parity. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", hitCount(col("toks"), Stopwords))
      .select(col("doc_id"), col("n_tokens"),
        round(length(regexp_replace(col("text"), " ", ""))
          .cast("double") / col("n_tokens"), 6).as("avg_token_len"),
        round(col("stop_hits").cast("double") / col("n_tokens"), 6)
          .as("stopword_ratio"),
        qualityExpr(col("n_tokens"), col("stop_hits")).as("quality"))
      .orderBy("doc_id")

  /** Percentile normalization of the quality score — the rank feature a
    * curation mixture consumes when absolute quality scales drift across
    * sources (a 0.6 from one scorer ≠ a 0.6 from another; the percentile
    * is comparable). percent_rank = (rank−1)/(N−1) over the
    * (quality, doc_id) total order: unique ranks, one exact-integer
    * division per row — bit-identical in the oracle.
    *
    * Computed WITHOUT a corpus-global window: each document's exact
    * 1-based position in the (quality, doc_id) total order comes from
    * the range-partitioned rank (graft.operators.Ranks.withGlobalPos —
    * the distributed zipWithIndex), and percent_rank is then the one
    * exact-integer-division (pos−1)/(N−1) per row. Skew-immune by
    * construction: the range partitioner splits ON THE FULL SORT KEY
    * (quality, doc_id), so even a corpus where every document shares
    * one quality value spreads evenly — the per-value-window
    * alternative would funnel the dominant value through a single
    * task. The only single-partition window left runs over the
    * ≤-shuffle-partitions-row partition histogram. */
  def qualityPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityScore(spark, dir).select(col("doc_id"), col("quality"))
    val ranked = graft.operators.Ranks.withGlobalPos(q,
      Seq(col("quality").asc, col("doc_id").asc), "__pos")
    ranked.select(col("doc_id"), col("quality"),
        when(col("__n") > 1,
          (col("__pos") - lit(1)).cast("double") /
            (col("__n") - lit(1)).cast("double"))
          .otherwise(lit(0.0)).as("pct_rank"))
      .orderBy("doc_id")
  }

  /** Rule-based document quality gates in the Gopher/C4 style: cheap
    * per-document heuristics that catch boilerplate, machine-generated
    * noise, and fragments BEFORE any model-based scorer runs — the
    * first filter stage of a web-scale curation pipeline, where a
    * one-scan codegen'd pass over 100 TB is the only affordable shape.
    * Gates (thresholds as published in the Gopher paper's rule set,
    * adapted to this corpus's scale): word count in [MinWords, MaxWords],
    * mean word length in [3, 10], ≥80% of words containing an alphabetic
    * character, ≥2 distinct stopwords present, and a symbol-to-word
    * ratio (#/ellipsis) ≤ 0.1. Every signal is exact integer arithmetic
    * or a single exact int/int→double division, so the flags are
    * bit-identical across engines. One whole-stage-codegen'd scan, zero
    * shuffles — runs at parquet-read speed at any scale. */
  val GopherMinWords = 50
  val GopherMaxWords = 100000

  def gopherFilters(spark: SparkSession, dir: String): DataFrame =
    gopherFiltersOf(Tables.load(spark, dir, "documents"))

  def gopherFiltersOf(docs: DataFrame): DataFrame = {
    val flagged = docs
      .withColumn("toks", tokens)
      .withColumn("n_words", size(col("toks")))
      .withColumn("n_alpha_words",
        size(filter(col("toks"), t => t.rlike("[A-Za-z]"))))
      .withColumn("n_stop_distinct",
        Stopwords.map(w =>
          when(array_contains(col("toks"), w), 1).otherwise(0))
          .reduce(_ + _))
      .withColumn("n_symbol_words",
        size(filter(col("toks"),
          t => t.contains("#") || t.contains("..."))))
      .withColumn("mean_word_len",
        length(regexp_replace(col("text"), " ", ""))
          .cast("double") / col("n_words"))
      .withColumn("pass_word_count",
        col("n_words") >= GopherMinWords &&
          col("n_words") <= GopherMaxWords)
      .withColumn("pass_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_alpha",
        col("n_alpha_words") * lit(10L) >= col("n_words") * lit(8L))
      .withColumn("pass_stop", col("n_stop_distinct") >= 2)
      .withColumn("pass_symbol",
        col("n_symbol_words") * lit(10L) <= col("n_words"))
    flagged.select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        col("n_alpha_words"), col("n_stop_distinct"), col("n_symbol_words"),
        col("pass_word_count"), col("pass_mean_word_len"), col("pass_alpha"),
        col("pass_stop"), col("pass_symbol"),
        (col("pass_word_count") && col("pass_mean_word_len") &&
          col("pass_alpha") && col("pass_stop") && col("pass_symbol"))
          .as("keep"))
      .orderBy("doc_id")
  }

  /** Attrition funnel through the Gopher gates, applied in the fixed
    * order above: survivors after each successive gate, plus the final
    * keep count. The audit a filter-pipeline change ships with — which
    * gate is doing the cutting. Same one-scan flags, folded to six
    * integer counts (map-side combinable conditional sums). */
  def gopherFunnel(spark: SparkSession, dir: String): DataFrame =
    gopherFunnelOf(Tables.load(spark, dir, "documents"))

  def gopherFunnelOf(docs: DataFrame): DataFrame = {
    val f = gopherFiltersOf(docs)
    val gates = Seq("pass_word_count", "pass_mean_word_len", "pass_alpha",
      "pass_stop", "pass_symbol")
    val cum = gates.inits.toSeq.reverse.tail // prefixes in gate order
    val counts = f.agg(
      count(lit(1)).as("total"),
      cum.zipWithIndex.map { case (prefix, i) =>
        sum(when(prefix.map(col).reduce(_ && _), 1L).otherwise(0L))
          .as(s"s$i")
      }: _*)
    val stages = lit("total") +: cum.indices.map(i =>
      lit(s"after_${gates(i).stripPrefix("pass_")}"))
    val values = col("total") +: cum.indices.map(i => col(s"s$i"))
    counts.select(
        explode(arrays_zip(
          array(stages: _*).as("stage"),
          sequence(lit(0), lit(gates.size)).as("stage_idx"),
          array(values: _*).as("survivors"))).as("z"))
      .select(col("z.stage_idx").cast("bigint").as("stage_idx"),
        col("z.stage").as("stage"), col("z.survivors").as("survivors"))
      .orderBy("stage_idx")
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** Language ID by marker-token counts (n-gram-free heuristic: argmax of
    * per-language stopword hits, 'und' (unknown) when no markers hit).
    * Declared `lang` is carried through for side-by-side evaluation. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val withHits = withLangHits(
      Tables.load(spark, dir, "documents").withColumn("toks", tokens))
    val best = bestLangExpr
    withHits.select(col("doc_id"), col("lang"), best._1.as("lang_pred"),
        best._2.as("marker_hits"))
      .orderBy("doc_id")
  }

  /** Per-language marker-hit columns over a toks-bearing frame — shared
    * by [[langId]] and [[qualityLangSignals]] so the two can never
    * drift. */
  private def withLangHits(df: DataFrame): DataFrame =
    LangMarkers.foldLeft(df) { case (d, (code, words)) =>
      d.withColumn(s"hits_$code", hitCount(col("toks"), words))
    }

  /** The (lang_pred, marker_hits) argmax fold over the hits_<code>
    * columns [[withLangHits]] adds — declaration-order strict-> ties,
    * exactly the published langId semantics. */
  private def bestLangExpr: (Column, Column) =
    LangMarkers.map(_._1).foldLeft(
      (lit("unknown"), lit(0))) { case ((bestLang, bestHits), code) =>
      val h = col(s"hits_$code")
      (when(h > bestHits, lit(code)).otherwise(bestLang),
        when(h > bestHits, h).otherwise(bestHits))
    }

  /** (doc_id, quality, lang_pred) in ONE documents scan — the gate
    * signals the curation front door consumes (guide §1.2 don't compute
    * twice / §2.4 no doc_id exchange): `curate` previously joined the
    * standalone qualityScore and langId operators, paying two full
    * tokenizing scans plus a doc_id-keyed join for per-row values one
    * scan already yields. The expressions are THE shared definitions
    * ([[qualityExpr]], the [[bestLangExpr]] argmax over
    * [[withLangHits]]), so every emitted value is bit-identical to the
    * standalone operators'. */
  private[graft] def qualityLangSignals(spark: SparkSession,
                                        dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", hitCount(col("toks"), Stopwords))
    withLangHits(base).select(col("doc_id"),
      qualityExpr(col("n_tokens"), col("stop_hits")).as("quality"),
      bestLangExpr._1.as("lang_pred"))
  }

  /** tf-idf-style top terms per document: score = tf × (N / df). The
    * inverse-document-frequency factor is kept as a plain ratio rather
    * than log(N/df) — same ranking for fixed tf levels, and exact-int
    * division is bit-identical across engines where `ln` is not (libm
    * last-ulp differences would break the oracle hash). Two shuffles:
    * term-count and df; the rank is a per-doc window over ≤ |vocab| rows. */
  /** Bigram language-model counts: top-k adjacent token pairs with the
    * conditional probability P(w2|w1) = n12 / n1. Bigram fan-out happens
    * in-partition (zip of two slices — no self-join, no explode² ); both
    * aggregations are map-side-combinable counts, and the n1 join is
    * w1-keyed. n1 counts bigram LEFT slots (tokens with a successor), so
    * Σ P(·|w1) = 1 exactly. */
  def bigramTop(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    bigramTopOf(Tables.load(spark, dir, "documents"), k)

  /** Core over any frame with a `text` column — fixture entry. */
  def bigramTopOf(docs: DataFrame, k: Int): DataFrame = {
    val bi = docs.select(tokens.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val n12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val n1 = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
    n12.join(n1, "w1")
      .withColumn("p_cond", col("n12").cast("double") / col("n1"))
      .orderBy(desc("n12"), asc("w1"), asc("w2"))
      .limit(k)
      .select("w1", "w2", "n12", "n1", "p_cond")
  }

  def topTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
    val terms = docs
      .select(col("doc_id"), explode(tokens).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("score"),
        col("rk").cast("long").as("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Character-trigram language ID — the n-gram-profile heuristic (Cavnar
    * & Trenkle family): score = |doc's char-trigram set ∩ language
    * profile|, argmax across languages, 'unknown' when nothing hits.
    * Profiles are tiny literal arrays (the top function-word trigrams per
    * language); at scale they stay broadcast literals inside one codegen'd
    * scan. Complements the marker-token langId. */
  private[text] val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th ", "the", "he ", " th", "is ", " is", "of ", " of"),
    "de" -> Seq("er ", "der", "ie ", "die", "und", "nd ", " un", "das"),
    "es" -> Seq("el ", " el", "la ", " la", "los", "os ", " y ", "de "),
    "fr" -> Seq("le ", " le", "es ", "et ", " et", "une", "ne ", "la "))

  def langIdNgram(spark: SparkSession, dir: String): DataFrame = {
    val text = lower(trim(col("text")))
    // char trigrams via split-to-chars + windowed rejoin (substring needs
    // literal offsets; slice does not)
    val chars = split(text, "")
    val tris = array_distinct(transform(
      sequence(lit(1), greatest(length(text) - 2, lit(1))),
      i => concat_ws("", slice(chars, i, lit(3)))))
    val withHits = TrigramProfiles.foldLeft(
      Tables.load(spark, dir, "documents").withColumn("tris", tris)) {
      case (df, (code, prof)) =>
        df.withColumn(s"hits_$code",
          size(array_intersect(col("tris"),
            array(prof.map(lit(_)): _*))))
    }
    val best = TrigramProfiles.map(_._1).foldLeft(
      (lit("unknown"), lit(0))) { case ((bestLang, bestHits), code) =>
      val h = col(s"hits_$code")
      (when(h > bestHits, lit(code)).otherwise(bestLang),
        when(h > bestHits, h).otherwise(bestHits))
    }
    withHits.select(col("doc_id"), col("lang"), best._1.as("lang_pred"),
        best._2.cast("long").as("ngram_hits"))
      .orderBy("doc_id")
  }

  /** Rolling-hash fingerprints (Rabin–Karp / winnowing family): a
    * polynomial fold over per-token hashes for the whole document, plus
    * the minimum over all 8-token window hashes — the winnowing
    * fingerprint that survives edits outside the minimizing window. All
    * exact integer arithmetic (multiply/add/mod), so the DuckDB
    * `list_reduce` twin is bit-identical. */
  val RollB = 1000003L
  val RollM = 2147483647L
  val RollWindow = 8

  private val tokenHash: Column => Column = t =>
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  private def rollFold(hashes: Column): Column =
    aggregate(hashes, lit(0L), (h, x) => (h * RollB + x) % RollM)

  def rollingHashes(spark: SparkSession, dir: String): DataFrame = {
    val hs = transform(tokens, tokenHash)
    Tables.load(spark, dir, "documents")
      .withColumn("hs", hs)
      .select(col("doc_id"),
        rollFold(col("hs")).as("roll_full"),
        when(size(col("hs")) >= RollWindow,
          array_min(transform(
            sequence(lit(1), size(col("hs")) - (RollWindow - 1)),
            i => rollFold(slice(col("hs"), i, lit(RollWindow))))))
          .otherwise(rollFold(col("hs"))).as("winnow_min"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: md5 of the normalized text (the exact-dedup
    * key) plus a content-defined prefix fingerprint (first 8 tokens) that
    * survives suffix edits — both deterministic and oracle-checkable. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", tokens)
      .select(col("doc_id"),
        md5(lower(trim(col("text")))).as("fp"),
        md5(concat_ws(" ", slice(col("toks"), 1, 8))).as("prefix_fp"))
      .orderBy("doc_id")

  /** Per-position occurrence count of each element within its own array
    * (the building block of the repetition metrics below). Quadratic in
    * array length — fine per DOCUMENT (arrays are token lists of one
    * doc, not corpus-sized), and it keeps the whole metric inside one
    * codegen'd scan with zero shuffles at any corpus size. */
  private def selfCounts(arr: Column): Column =
    transform(arr, t => size(filter(arr, x => x === t)))

  private def wordNgrams(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))

  /** Repetition / boilerplate metrics (the Gopher-rule family): fraction
    * of tokens taken by the most frequent token, fraction of word-2-grams
    * taken by the most frequent 2-gram, and the fraction of word-3-gram
    * positions whose 3-gram occurs more than once. High values flag
    * degenerate/templated text a curation pass drops. All counts are
    * exact ints; each fraction is ONE int/int double division, so the
    * DuckDB twin is bit-identical. Short docs yield null for undefined
    * fractions (no 2-grams in a 1-token doc) rather than a fake 0. */
  def repetitionOf(docs: DataFrame): DataFrame = {
    val n = size(col("toks"))
    def fracTop(arr: Column, denom: Column): Column =
      array_max(selfCounts(arr)).cast("double") / denom
    val bi = wordNgrams(col("toks"), 2)
    val tri = wordNgrams(col("toks"), 3)
    docs
      .withColumn("toks", tokens)
      .select(col("doc_id"), n.cast("bigint").as("n_tokens"),
        when(n >= 1, fracTop(col("toks"), n)).as("top_token_frac"),
        when(n >= 2, fracTop(bi, n - 1)).as("top_bigram_frac"),
        when(n >= 3, size(filter(selfCounts(tri), c => c > 1))
          .cast("double") / (n - 2)).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.load(spark, dir, "documents"))

  /** PII detector patterns — ASCII-only constructs so Java regex (Spark)
    * and RE2 (DuckDB) match identically; counts are non-overlapping
    * left-to-right matches, the shared semantics of regexp_extract_all
    * in both engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** PII pattern counts per document (emails, phone-shaped numbers,
    * IPv4-shaped dotted quads) + a has_pii gate — the scrubbing signal a
    * training pipeline computes before release. One codegen'd scan. The
    * driver testdata is synthetic word-salad (zero hits, still
    * hash-checked); crafted fixtures in TextSpec assert the nonzero
    * behavior. */
  def piiCountsOf(docs: DataFrame): DataFrame = {
    def cnt(re: String): Column =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("bigint")
    docs.select(col("doc_id"),
        cnt(EmailRe).as("n_emails"),
        cnt(PhoneRe).as("n_phones"),
        cnt(Ipv4Re).as("n_ipv4"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ipv4") > 0)
      .orderBy("doc_id")
  }

  def piiCounts(spark: SparkSession, dir: String): DataFrame =
    piiCountsOf(Tables.load(spark, dir, "documents"))

  /** PII REDACTION — the scrub that follows the count audit before a
    * corpus ships: emails → [EMAIL], phone-shaped numbers → [PHONE],
    * dotted quads → [IP], applied in that fixed order on both engines
    * (order is part of the semantics when classes could overlap). The
    * output row stays narrow — redacted-text fingerprint, post-redaction
    * length, and a changed flag — so the verify dump is the proof the
    * redaction applied without shipping full text through the gate. One
    * codegen'd scan; TextSpec asserts the rewrite on crafted PII (the
    * driver corpus is word-salad, where redaction is the identity —
    * itself hash-checked). */
  def piiRedactOf(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe), lit("[PHONE]")),
      lit(Ipv4Re), lit("[IP]"))
    docs.select(col("doc_id"),
      md5(encode(redacted, "UTF-8")).as("redacted_fp"),
      length(redacted).cast("bigint").as("n_chars_redacted"),
      (redacted =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOf(Tables.load(spark, dir, "documents"))

  /** Commonness score: mean corpus document-frequency over a document's
    * DISTINCT tokens — a fluency/noise proxy (rare-token-heavy docs are
    * OCR garbage, code, or exotic boilerplate; a unigram-LM log-prob
    * without the cross-engine libm hazard, since df sums are exact
    * longs and the mean is one final division). Two map-side-combine
    * shuffles (per-doc distinct, per-term df) + a term-keyed join — at
    * warehouse scale the df relation is the vocabulary, broadcast or
    * bucketed by term. */
  def commonnessOf(docs: DataFrame): DataFrame = {
    val terms = docs
      .select(col("doc_id"), explode(tokens).as("term"))
      .distinct()
    val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
    terms.join(df, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct"), sum("df").as("df_sum"))
      .select(col("doc_id"), col("n_distinct"), col("df_sum"),
        (col("df_sum").cast("double") / col("n_distinct")).as("mean_df"))
      .orderBy("doc_id")
  }

  def commonness(spark: SparkSession, dir: String): DataFrame =
    commonnessOf(Tables.load(spark, dir, "documents"))

  /** Corpus length histogram: doc counts per 64-char bucket (+ exact
    * char sums) — the size-profile a mixture designer reads before
    * setting sampling weights. One partial-agg shuffle over ≤ a few
    * hundred bucket keys. */
  def lengthHistOf(docs: DataFrame): DataFrame =
    docs.groupBy(floor(col("n_chars") / lit(64)).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("bigint").as("min_chars"),
        max(col("n_chars")).cast("bigint").as("max_chars"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy("bucket")

  def lengthHist(spark: SparkSession, dir: String): DataFrame =
    lengthHistOf(Tables.load(spark, dir, "documents"))

  /** Vocabulary construction with coverage: top-k terms by corpus
    * occurrence count, with the cumulative fraction of ALL token
    * occurrences the vocabulary prefix covers — the curve a tokenizer
    * designer reads to size a vocab. Count+total are exact longs
    * (order-independent sums); the coverage division happens once per
    * emitted row. The term count is one map-side-combine shuffle; the
    * cumulative window runs over the k SURVIVING rows only (TakeOrdered
    * then a bounded single-partition window — k rows, not corpus rows). */
  def vocabCoverageOf(docs: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(explode(tokens).as("term"))
    val counts = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = terms.agg(count(lit(1)).as("total"))
    val top = counts.orderBy(desc("cnt"), asc("term")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("cnt"), asc("term"))))
    top.crossJoin(broadcast(total))
      .withColumn("cum_cnt", sum("cnt").over(
        Window.orderBy("rk").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("rk").cast("bigint").as("rk"), col("term"), col("cnt"),
        col("cum_cnt"),
        (col("cum_cnt").cast("double") / col("total")).as("cum_frac"))
      .orderBy("rk")
  }

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageOf(Tables.load(spark, dir, "documents"))

  /** Benchmark doc_ids whose leading 8-token window defines the
    * decontamination fingerprint set (a stand-in for a held-out eval
    * set's n-grams). */
  val BenchmarkDocIds: Seq[Long] = Seq(0L, 10L, 20L, 30L, 40L)

  /** Benchmark decontamination: flag every document containing any
    * benchmark 8-token-window fingerprint (the n-gram-overlap test a
    * training pipeline runs against eval sets before release). Window
    * fingerprints reuse the Rabin–Karp fold of [[rollingHashes]]; the
    * benchmark side reduces to a tiny distinct hash set → broadcast
    * semi-join against the in-scan window relation. Never n²; the 100 TB
    * side is one scan. Benchmark docs flag themselves — the built-in
    * sanity check (asserted in TextSpec). */
  def contaminationOf(docs: DataFrame,
                      benchmarkIds: Seq[Long] = BenchmarkDocIds): DataFrame = {
    val withHashes = docs.withColumn("hs", transform(tokens, tokenHash))
    val windows = withHashes.select(col("doc_id"),
      explode(when(size(col("hs")) >= RollWindow,
        transform(sequence(lit(1), size(col("hs")) - (RollWindow - 1)),
          i => rollFold(slice(col("hs"), i, lit(RollWindow)))))
        .otherwise(array().cast("array<bigint>"))).as("wh"))
    val bench = withHashes
      .filter(col("doc_id").isin(benchmarkIds: _*))
      .filter(size(col("hs")) >= RollWindow)
      .select(rollFold(slice(col("hs"), 1, RollWindow)).as("wh"))
      .distinct()
    val hits = windows.join(broadcast(bench), "wh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("is_contaminated"))
      .orderBy("doc_id")
  }

  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationOf(Tables.load(spark, dir, "documents"))

  /** Fixed query-term set for the BM25 registry row — mixed corpus
    * frequencies so the idf factor actually discriminates. */
  val Bm25QueryTerms: Seq[String] = Seq("spark", "query", "stream", "vector")

  /** BM25 ranked retrieval against a fixed query-term set — the
    * primitive a curation pipeline uses to pull topical subsets out of
    * a 100 TB corpus. Robertson saturated-tf shape
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with the idf factor kept as
    * the exact rational (N−df+0.5)/(df+0.5)+1 rather than its ln — the
    * repo's [[topTerms]] convention: libm last-ulp differences break
    * cross-engine hashes, and per term the transform is monotone.
    * Two scans: ONE corpus-stats aggregate collapsed to a single
    * broadcast row (N, Σdl, per-term df — the only shuffle, a scalar
    * fold), then one scoring scan with per-doc tf read off the token
    * array in place and the per-term scores summed in FIXED term order
    * (left-assoc, mirrored in the oracle) so every double is
    * bit-reproducible. Constants enter as lit-vs-literal pairs computed
    * the same way on both engines (1.2 + 1.0, never a pre-folded 2.2 —
    * Scala's fold and SQL's parse could differ in the last ulp).
    * Top-k is a TakeOrdered with the id tie-break. */
  def bm25Search(spark: SparkSession, dir: String,
                 terms: Seq[String] = Bm25QueryTerms,
                 k: Int = 20): DataFrame =
    bm25SearchOf(Tables.load(spark, dir, "documents"), terms, k)

  /** Core over any frame with doc_id + text columns — fixture entry. */
  def bm25SearchOf(docsIn: DataFrame, terms: Seq[String],
                   k: Int): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), tokens.as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val statsAggs =
      count(lit(1)).cast("long").as("n_docs") +:
        sum(col("dl")).as("sum_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
            .as(s"df_$i")
        }
    val stats = docs.agg(statsAggs.head, statsAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val termScores = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val idf = (col("n_docs").cast("double") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5)) + lit(1.0)
      idf * (tf * (lit(1.2) + lit(1.0))) /
        (tf + lit(1.2) * ((lit(1.0) - lit(0.75)) +
          lit(0.75) * (col("dl").cast("double") / avgdl)))
    }
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        termScores.reduce(_ + _).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id")).limit(k)
  }

  /** Hybrid retrieval — the RAG serving primitive: fuse the LEXICAL arm
    * (BM25 over the pinned query terms) with the VECTOR arm (exact
    * cosine against the seed embedding standing in for the encoded
    * query) by reciprocal-rank fusion. Each arm is EXACTLY its
    * standalone registry query (`text_bm25_search`, `sim_cosine_topk`)
    * — composability is the point: both arms are already hash-verified,
    * and the fusion adds only rank windows over the two k-row survivor
    * lists (bounded — the allowed single-partition window shape) plus
    * one full-outer join of ≤2k rows. The fused score is two
    * fixed-order double ops (the [[graft.operators.Recs.rrfFusion]]
    * convention), bit-exact in the oracle. At 100 TB each arm's
    * candidate generation is what scales (BM25 scan-and-topk / ANN
    * probe); the fusion cost is O(k). vec_id keys doc_id in the
    * testdata, making the two arms joinable. */
  /** Hybrid-retrieval constants, shared with the oracle generator so a
    * changed Scala default can never silently drift from the SQL twin
    * (the RrfK/SweepThresholds convention): RRF k, per-arm depth, the
    * seed vector, and the fused top-k. */
  val RrfK: Int = 60
  val HybridSeedId: Long = 0L
  val HybridKEach: Int = 20
  val HybridK: Int = 10

  def hybridRetrieval(spark: SparkSession, dir: String,
                      terms: Seq[String] = Bm25QueryTerms,
                      seedId: Long = HybridSeedId,
                      kEach: Int = HybridKEach, k: Int = HybridK,
                      rrfK: Int = RrfK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25Search(spark, dir, terms, kEach)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(desc("bm25"), asc("doc_id"))).as("r_lex"))
    val vec = graft.similarity.Similarity.cosineTopK(spark, dir, seedId,
        kEach)
      .select(col("vec_id").as("doc_id"), row_number()
        .over(Window.orderBy(desc("cos"), asc("vec_id"))).as("r_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_vec")), lit(0.0)))
          .as("rrf_score"),
        (col("r_lex").isNotNull.cast("int") +
          col("r_vec").isNotNull.cast("int")).as("n_arms"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(k)
  }

  /** Fixed-size token chunking with overlap — the context-window
    * chunker every training pipeline runs before packing: windows of
    * `size` tokens at stride `size − overlap`, last partial window
    * kept iff it adds unseen tokens (start < n). Pure per-row array
    * slicing inside one codegen'd scan — zero shuffles, so at 100 TB
    * this runs at parquet-read speed and the output partitioning
    * inherits the scan's (chunks of a doc stay in its partition).
    * Chunk ids are (doc_id, chunk_ix) — globally unique without any
    * windowed numbering. */
  def chunkTokens(spark: SparkSession, dir: String, chunkSize: Int = 64,
                  overlap: Int = 16): DataFrame =
    chunkTokensOf(Tables.load(spark, dir, "documents"), chunkSize, overlap)

  /** Core over any frame with doc_id + text columns — fixture entry. */
  def chunkTokensOf(docs: DataFrame, chunkSize: Int,
                    overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0)
    val stride = chunkSize - overlap
    // Window count via pure integer ceil-division — exact on both
    // engines, no float boundary to disagree about.
    val lastIx = expr(
      s"CAST((greatest(n - $chunkSize, 0) + ${stride - 1}) div $stride" +
        " AS INT)")
    docs
      .select(col("doc_id"), tokens.as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lastIx),
          i => slice(col("toks"), i * stride + 1, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_ix"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_ix")
  }

  /** Corpus-LM likelihood scoring — the surprisal-proxy quality signal:
    * score each document by the mean (and min) conditional probability
    * of its adjacent-token bigrams under the corpus's own bigram LM
    * P(w2|w1) = n12/n1. Natural text scores high; shuffled or
    * boilerplate-spliced text trips low-probability transitions. Kept
    * in probability space (no ln — the [[topTerms]] libm-parity
    * convention); the per-doc mean folds in sorted order (the repo's
    * canonical float-sum convention) and min is order-free. Docs with
    * <2 tokens have no bigrams and drop out (the [[repetitionOf]]
    * NULL-not-fake-zero stance, expressed as absence). Scale shape:
    * the LM tables are vocab-bounded aggregations, the probability
    * lookup is a bigram-keyed join (no driver-side model), and the
    * per-doc fold is doc-length-bounded. */
  def lmLikelihood(spark: SparkSession, dir: String): DataFrame =
    lmPerDoc(spark, dir).orderBy("doc_id")

  /** The per-doc LM-likelihood relation, memoized + persisted per dir:
    * three registry rows (the likelihood row itself, the quality-LM
    * agreement and the reliability curve) each rebuilt the bigram LM —
    * two vocab aggregations + a bigram-keyed join — from scratch (r15,
    * ~1.4 s each). One row per document (narrow), the same persistence
    * posture as the dedup shingle index; the boundary sort stays on the
    * registry row. */
  private[text] def lmPerDoc(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.get(spark, "text-lm-perdoc", dir) {
      lmLikelihoodCore(Tables.load(spark, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Core over any frame with doc_id + text columns — fixture entry. */
  def lmLikelihoodOf(docs: DataFrame): DataFrame =
    lmLikelihoodCore(docs).orderBy("doc_id")

  private def lmLikelihoodCore(docs: DataFrame): DataFrame = {
    val bi = docs.select(col("doc_id"), tokens.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val n12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val n1 = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
    val p = bi.join(n12, Seq("w1", "w2")).join(n1, Seq("w1"))
      .select(col("doc_id"),
        (col("n12").cast("double") / col("n1")).as("p"))
    p.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(sort_array(collect_list(col("p"))), lit(0.0),
          (s, x) => s + x).as("sum_p"),
        min(col("p")).as("min_pcond"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_p") / col("n_bigrams")).as("mean_pcond"),
        col("min_pcond"))
  }

  /** Boilerplate-prefix detection: the header/template detector — group
    * documents by their first `w`-token prefix and surface prefixes
    * shared by ≥2 documents (scraped corpora carry the same navigation
    * or license header on thousands of pages; prefix-level grouping
    * catches what whole-doc dedup cannot once bodies diverge). Docs
    * shorter than `w` tokens are skipped — a partial prefix is not
    * evidence of a shared template. One scan + one count aggregation;
    * the prefix key is w-token-bounded so the shuffle carries short
    * strings, and min(doc_id) gives a deterministic example. */
  def boilerplatePrefixes(spark: SparkSession, dir: String, w: Int = 8,
                          k: Int = 20): DataFrame =
    boilerplatePrefixesOf(Tables.load(spark, dir, "documents"), w, k)

  /** Core over any frame with doc_id + text columns — fixture entry. */
  def boilerplatePrefixesOf(docs: DataFrame, w: Int, k: Int): DataFrame =
    docs.select(col("doc_id"), tokens.as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"),
        array_join(slice(col("toks"), lit(1), lit(w)), " ").as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), asc("prefix")).limit(k)

  /** Chunk-level duplication report: run the context-window chunker,
    * then measure how much of the chunk stream is repeated text —
    * the number training pipelines watch because template/boilerplate
    * duplication INSIDE otherwise-distinct documents survives doc-level
    * dedup and still burns training tokens. One extra count aggregation
    * over [[chunkTokens]]'s zero-shuffle scan; the duplicate fraction
    * is one exact-int division. */
  def chunkDedupReport(spark: SparkSession, dir: String): DataFrame = {
    val perChunk = chunkTokens(spark, dir)
      .groupBy("chunk_text").agg(count(lit(1)).as("n"))
    perChunk.agg(
      sum(col("n")).as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_in_dup_groups"))
      .select(col("n_chunks"), col("n_distinct"),
        (col("n_chunks") - col("n_distinct")).as("n_redundant"),
        ((col("n_chunks") - col("n_distinct")).cast("double") /
          col("n_chunks")).as("redundant_frac"),
        col("n_in_dup_groups"))
  }

  /** Cross-document repeated-passage detection: slide a `w`-token
    * window at stride `s` over every document and surface passages that
    * appear in ≥2 DISTINCT documents — the passage-granularity
    * boilerplate detector. Overlapping windows (s < w) catch a shared
    * passage whenever its occurrences sit at offsets congruent mod `s`
    * — always true for cloned templates (same position in every page)
    * and 1/s-recall for arbitrarily shifted repeats; s=1 is the
    * exhaustive setting at w× exploded width. The fixed-chunk stream of
    * [[chunkDedupReport]] only catches chunk-aligned repeats, and
    * [[boilerplatePrefixes]] only position-0 templates — this covers
    * footers, injected license blocks, navigation snippets sitting
    * mid-document. Cross-doc only: within-doc repetition is
    * [[repetitionOf]]'s signal, so occurrences are counted but the ≥2
    * gate is on distinct doc_ids. Docs shorter than `w` are skipped — a
    * partial window is not passage evidence (the [[boilerplatePrefixes]]
    * stance).
    *
    * Scale shape: one codegen'd scan explodes ≈ n_tokens/s windows per
    * doc; the single shuffle groups by the w-token-bounded passage
    * string with map-side partial aggregation soaking up within-
    * partition repeats. No pairwise comparison anywhere — cost is
    * linear in corpus tokens at any scale, ~w/s× the raw token stream
    * in exploded width. Top-k compiles to TakeOrderedAndProject. */
  def repeatedPassages(spark: SparkSession, dir: String, w: Int = 16,
                       s: Int = 4, k: Int = 20): DataFrame =
    repeatedPassagesOf(Tables.load(spark, dir, "documents"), w, s, k)

  /** Core over any frame with doc_id + text columns — fixture entry. */
  def repeatedPassagesOf(docs: DataFrame, w: Int, s: Int,
                         k: Int): DataFrame = {
    require(w > 0 && s > 0 && s <= w)
    // Last window start via exact integer division — n ≥ w is already
    // filtered, so (n − w) div s is non-negative on both engines.
    val lastIx = expr(s"CAST((n - $w) div $s AS INT)")
    docs.select(col("doc_id"), tokens.as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lastIx),
          i => array_join(slice(col("toks"), i * s + 1, lit(w)), " ")))
          .as("passage"))
      .groupBy("passage")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), desc("n_occurrences"), asc("passage"))
      .limit(k)
  }

  /** Default window/stride for [[dupSpanMass]], shared with the oracle
    * generator so the twin cannot drift. */
  val DupSpanW: Int = 16
  val DupSpanS: Int = 4

  /** Per-document duplicated-span MASS — the span-level removal metric
    * (the "dedup the substring, not the document" accounting): for each
    * document, how many of its tokens sit inside at least one w-token
    * window that also appears in ≥2 distinct documents, and what
    * fraction of the doc that is. [[repeatedPassagesOf]] surfaces the
    * top offending passages; this is the other side of that audit — the
    * per-doc burn rate a curation pipeline thresholds on (a doc that is
    * 80% shared boilerplate is a drop candidate even if no single
    * passage tops any chart).
    *
    * Shape: the same linear window explode (hashed to md5 so the
    * duplicate shuffle moves 32-byte keys, not w-token strings), one
    * countDistinct-gated duplicate set, a same-key join back, and
    * covered-position union via count(DISTINCT pos) per doc — overlap
    * between flagged windows is not double-counted. Every step is
    * linear in corpus tokens (~w/s× exploded width); no pairwise
    * comparison anywhere. Docs shorter than w report zero dup mass. */
  def dupSpanMass(spark: SparkSession, dir: String, w: Int = DupSpanW,
                  s: Int = DupSpanS): DataFrame =
    dupSpanMassOf(Tables.load(spark, dir, "documents"), w, s)

  def dupSpanMassOf(docs: DataFrame, w: Int, s: Int): DataFrame = {
    require(w > 0 && s > 0 && s <= w)
    val base = docs.select(col("doc_id"), tokens.as("toks"))
      .withColumn("n", size(col("toks")))
    val lastIx = expr(s"CAST((n - $w) div $s AS INT)")
    val spans = base.filter(col("n") >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lastIx),
          i => struct(i.as("ix"),
            md5(array_join(slice(col("toks"), i * s + 1, lit(w)), " "))
              .as("h")))).as("sp"))
      .select(col("doc_id"), col("sp.ix").as("ix"), col("sp.h").as("h"))
    val dup = spans.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    // Window count and covered-position union fold in ONE multi-distinct
    // aggregation over the flagged windows (ix is unique per doc, so
    // countDistinct(ix) ≡ the window count) — a naive two-branch plan
    // re-ran the span explode and the duplicate-set shuffle once per
    // branch (audited: 4 explode scans → 2, and the duplicate-set
    // shuffle runs once instead of twice).
    val perDoc = spans.join(dup, "h")
      .select(col("doc_id"), col("ix"),
        explode(sequence(col("ix") * s, col("ix") * s + (w - 1))).as("p"))
      .groupBy("doc_id")
      .agg(countDistinct(col("ix")).as("n_dup_windows"),
        countDistinct(col("p")).as("n_dup_tokens"))
    base.select(col("doc_id"), col("n"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        (coalesce(col("n_dup_tokens"), lit(0L)).cast("double") / col("n"))
          .as("dup_token_frac"))
      .orderBy("doc_id")
  }

  /** Quality-signal agreement: exact Pearson correlation between the
    * heuristic quality score and the corpus-LM mean bigram likelihood —
    * the sanity check a curation pipeline runs before blending or
    * swapping quality signals (uncorrelated scorers gate different
    * documents; a high r says the cheap heuristic is a fair proxy).
    * The five moment sums fold through one doc_id-chunked level first
    * (the [[graft.similarity.Similarity.labelCentroids]] fixed-fan-in
    * posture — no |docs|-sized array in a single task at 100 TB), each
    * partial in sorted order, and sqrt is IEEE-exact, so r is
    * bit-reproducible. One row out. */
  def qualitySignalCorrelation(spark: SparkSession,
                               dir: String): DataFrame = {
    def foldSum(c: Column): Column =
      aggregate(sort_array(c), lit(0.0), (s, x) => s + x)
    val xy = qualityScore(spark, dir).select(col("doc_id"),
        col("quality").as("x"))
      .join(lmPerDoc(spark, dir).select(col("doc_id"),
        col("mean_pcond").as("y")), "doc_id")
    val lvl = xy
      .groupBy(shiftright(col("doc_id"), 10).as("chunk"))
      .agg(count(lit(1)).as("n"),
        foldSum(collect_list(col("x"))).as("sx"),
        foldSum(collect_list(col("y"))).as("sy"),
        foldSum(collect_list(col("x") * col("y"))).as("sxy"),
        foldSum(collect_list(col("x") * col("x"))).as("sxx"),
        foldSum(collect_list(col("y") * col("y"))).as("syy"))
    lvl.agg(sum(col("n")).as("n"),
        foldSum(collect_list(col("sx"))).as("sx"),
        foldSum(collect_list(col("sy"))).as("sy"),
        foldSum(collect_list(col("sxy"))).as("sxy"),
        foldSum(collect_list(col("sxx"))).as("sxx"),
        foldSum(collect_list(col("syy"))).as("syy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
          .as("pearson_r"))
  }

  /** Scorer calibration (reliability) curve: mean corpus-LM likelihood
    * per heuristic-quality decile — the table that says whether the
    * cheap quality score actually tracks the expensive signal it
    * proxies (a flat curve means the heuristic is noise; monotone
    * means the decile threshold is a usable gate). Deciles are exact
    * integer micro-unit buckets; the per-decile likelihood mean runs
    * through the two-level chunked sorted fold (doc_id >> 10 leaves —
    * the qualitySignalCorrelation shape), so no decile ever sinks an
    * unbounded double list into one task. */
  def qualityReliability(spark: SparkSession, dir: String): DataFrame = {
    def foldSum(c: Column): Column =
      aggregate(sort_array(collect_list(c)), lit(0.0), (s, x) => s + x)
    val q6 = qualityScore(spark, dir).select(col("doc_id"),
      round(col("quality") * lit(1000000.0)).cast("long").as("q6"))
    val lm = lmPerDoc(spark, dir).select("doc_id", "mean_pcond")
    val leaves = q6.join(lm, "doc_id")
      .groupBy(least(expr("q6 div 100000"), lit(9L)).as("quality_decile"),
        shiftright(col("doc_id"), 10).as("chunk"))
      .agg(count(lit(1)).as("n"), sum(col("q6")).as("sq"),
        foldSum(col("mean_pcond")).as("sp"))
    leaves.groupBy("quality_decile")
      .agg(sum(col("n")).as("n_docs"),
        ((sum(col("sq")).cast("double") / lit(1000000.0)) /
          sum(col("n"))).as("mean_quality"),
        (foldSum(col("sp")) / sum(col("n"))).as("mean_lm_pcond"))
      .orderBy("quality_decile")
  }

  /** Vocabulary growth curve (Heaps' law): cumulative distinct-term
    * count as the corpus grows in fixed doc_id buckets — the curve
    * that sizes a tokenizer vocabulary and tells a crawl when new data
    * stops bringing new words. No running-distinct state: each term
    * contributes at its FIRST bucket (the dau_cumulative
    * first-activity trick on terms), so the plan is one term→min
    * bucket aggregation plus a cumulative window over the bucket
    * relation (bounded by the bucket count, never terms or tokens). */
  def vocabGrowth(spark: SparkSession, dir: String,
                  bucketBits: Int = 6): DataFrame = {
    val firstB = Tables.load(spark, dir, "documents")
      .select(shiftright(col("doc_id"), bucketBits).as("bucket"),
        explode(tokens).as("term"))
      .groupBy("term").agg(min(col("bucket")).as("first_bucket"))
      .groupBy("first_bucket").agg(count(lit(1)).as("new_terms"))
    val docsPerB = Tables.load(spark, dir, "documents")
      .groupBy(shiftright(col("doc_id"), bucketBits).as("first_bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("first_bucket")
    docsPerB.join(firstB, Seq("first_bucket"), "left")
      .na.fill(0L, Seq("new_terms"))
      .select(col("first_bucket").as("bucket"), col("n_docs"),
        col("new_terms"),
        sum(col("n_docs")).over(w).as("cum_docs"),
        sum(col("new_terms")).over(w).as("cum_vocab"))
      .orderBy("bucket")
  }

  /** Clean doc_ids (no benchmark window hit) — the gate curate_full
    * composes. */
  def cleanDocIds(spark: SparkSession, dir: String): DataFrame =
    contamination(spark, dir).filter(!col("is_contaminated"))
      .select("doc_id")

  /** Count-min-sketch heavy hitters: the exact top-k terms next to their
    * CMS estimates. The sketch builds distributively (per-partition
    * sketches merge associatively — at 100 TB the sketch pass is the
    * cheap half and the exact count the audit), with a fixed seed for
    * determinism. CMS never undercounts (estimate ≥ exact — asserted in
    * TextSpec); the k-row estimate loop is driver-side behind the top-k
    * limit, like every serving shim. Rows-only registry entry — the
    * sketch tier (HLL, quantiles) has no SQL twin. */
  def heavyHittersCms(spark: SparkSession, dir: String, k: Int = 20,
                      eps: Double = 0.001,
                      confidence: Double = 0.99): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(tokens).as("term"))
    val cms = toks.stat.countMinSketch("term", eps, confidence, 42)
    toks.groupBy("term").agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact"), asc("term")).limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        cms.estimateCount(r.getString(0))))
      .toSeq.toDF("term", "n_exact", "n_cms")
      .orderBy(desc("n_exact"), asc("term"))
  }

  /** CMS guarantee as one boolean (for the sketch audit row): every
    * top-k estimate ≥ its exact count (CMS never undercounts), and the
    * overcount stays ≤ ε·N where N is the stream length — deterministic
    * under the fixed sketch seed. */
  def cmsAuditOk(spark: SparkSession, dir: String,
                 eps: Double = 0.001): Boolean = {
    val n = Tables.load(spark, dir, "documents")
      .select(explode(tokens).as("term")).count()
    heavyHittersCms(spark, dir, eps = eps).collect().forall { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      est >= exact && est - exact <= math.ceil(eps * n).toLong
    }
  }
}

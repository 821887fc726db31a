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

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** GPT-2-style pre-tokenization regex, restricted to constructs with
    * identical semantics in Java regex and RE2 (DuckDB): contraction
    * suffixes, space-prefixed letter/digit runs, punctuation runs. ASCII
    * classes only — Unicode property classes differ across engines. */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"

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
        round(least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) *
          (lit(1.0) - col("stop_hits").cast("double") / col("n_tokens")), 6)
          .as("quality"))
      .orderBy("doc_id")

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** Language ID by marker-token counts (n-gram-free heuristic: argmax of
    * per-language stopword hits, 'und' (unknown) when no markers hit).
    * Declared `lang` is carried through for side-by-side evaluation. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val withHits = LangMarkers.foldLeft(
      Tables.load(spark, dir, "documents").withColumn("toks", tokens)) {
      case (df, (code, words)) =>
        df.withColumn(s"hits_$code", hitCount(col("toks"), words))
    }
    val best = LangMarkers.map(_._1).foldLeft(
      (lit("unknown"), lit(0))) { case ((bestLang, bestHits), code) =>
      val h = col(s"hits_$code")
      (when(h > bestHits, lit(code)).otherwise(bestLang),
        when(h > bestHits, h).otherwise(bestHits))
    }
    withHits.select(col("doc_id"), col("lang"), best._1.as("lang_pred"),
        best._2.as("marker_hits"))
      .orderBy("doc_id")
  }

  /** tf-idf-style top terms per document: score = tf × (N / df). The
    * inverse-document-frequency factor is kept as a plain ratio rather
    * than log(N/df) — same ranking for fixed tf levels, and exact-int
    * division is bit-identical across engines where `ln` is not (libm
    * last-ulp differences would break the oracle hash). Two shuffles:
    * term-count and df; the rank is a per-doc window over ≤ |vocab| rows. */
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
}

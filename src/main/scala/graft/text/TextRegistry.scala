package graft.text

import graft.Registry

/** Registry + DuckDB oracle twins for text analysis. The oracle SQL
  * mirrors the Spark expressions operation-for-operation (same tokenizer
  * regex, same rounding) so hash-match holds. */
object TextRegistry {

  private val Toks = raw"string_split_regex(trim(text), '\s+')"

  /** Shared CTE prefix of the Gopher-gate oracles: the per-document
    * flags, expression-for-expression the Spark ones (same stopword
    * set, same exact-integer cross-multiplies for the ratio gates).
    * private[graft]: the curation dataset-card oracle composes it. */
  private[graft] val GopherFlagsSql: String = {
    val stopSum = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      .map(w => s"CAST(list_contains(toks, '$w') AS BIGINT)")
      .mkString(" + ")
    s"""WITH f AS (SELECT doc_id, $Toks AS toks,
       |  length(replace(text, ' ', '')) AS nsp
       |FROM documents),
       |g AS (SELECT doc_id,
       |  len(toks) AS n_words,
       |  len(list_filter(toks,
       |    t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha_words,
       |  $stopSum AS n_stop_distinct,
       |  len(list_filter(toks,
       |    t -> contains(t, '#') OR contains(t, '...'))) AS n_symbol_words,
       |  nsp * 1.0 / len(toks) AS mean_word_len,
       |  len(toks) >= ${TextAnalysis.GopherMinWords}
       |    AND len(toks) <= ${TextAnalysis.GopherMaxWords}
       |    AS pass_word_count,
       |  nsp * 1.0 / len(toks) >= 3.0 AND nsp * 1.0 / len(toks) <= 10.0
       |    AS pass_mean_word_len,
       |  len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) * 10
       |    >= len(toks) * 8 AS pass_alpha,
       |  ($stopSum) >= 2 AS pass_stop,
       |  len(list_filter(toks,
       |    t -> contains(t, '#') OR contains(t, '...'))) * 10
       |    <= len(toks) AS pass_symbol
       |FROM f)""".stripMargin
  }

  val registry: Registry = Registry(
    queries = Map(
      "text_token_counts" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        TextAnalysis.tokenCounts(s, d)
          .withColumn("n_tokens", col("n_tokens").cast("bigint"))
          .withColumn("n_bpe_pieces", col("n_bpe_pieces").cast("bigint"))
          .withColumn("n_chars_text", col("n_chars_text").cast("bigint"))
          .withColumn("n_subwords_est", col("n_subwords_est").cast("bigint"))
      }),
      "text_quality" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        TextAnalysis.qualityScore(s, d)
          .withColumn("n_tokens", col("n_tokens").cast("bigint"))
      }),
      "text_langid" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        TextAnalysis.langId(s, d)
          .withColumn("marker_hits", col("marker_hits").cast("bigint"))
      }),
      "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
      "text_top_terms" -> ((s, d) => TextAnalysis.topTerms(s, d)),
      "text_rolling_hash" -> ((s, d) => TextAnalysis.rollingHashes(s, d)),
      "text_langid_ngram" -> ((s, d) => TextAnalysis.langIdNgram(s, d)),
      "text_repetition" -> ((s, d) => TextAnalysis.repetition(s, d)),
      "text_pii_counts" -> ((s, d) => TextAnalysis.piiCounts(s, d)),
      "text_pii_redact" -> ((s, d) => TextAnalysis.piiRedact(s, d)),
      "text_quality_percentiles" -> ((s, d) =>
        TextAnalysis.qualityPercentiles(s, d)),
      "text_gopher_filters" -> ((s, d) => {
        import org.apache.spark.sql.functions.col
        TextAnalysis.gopherFilters(s, d)
          .withColumn("n_words", col("n_words").cast("bigint"))
          .withColumn("n_alpha_words", col("n_alpha_words").cast("bigint"))
          .withColumn("n_stop_distinct",
            col("n_stop_distinct").cast("bigint"))
          .withColumn("n_symbol_words", col("n_symbol_words").cast("bigint"))
      }),
      "text_gopher_funnel" -> ((s, d) => TextAnalysis.gopherFunnel(s, d)),
      "text_commonness" -> ((s, d) => TextAnalysis.commonness(s, d)),
      "text_length_hist" -> ((s, d) => TextAnalysis.lengthHist(s, d)),
      "text_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
      "text_contamination" -> ((s, d) => TextAnalysis.contamination(s, d)),
      "text_bigrams" -> ((s, d) => TextAnalysis.bigramTop(s, d)),
      "text_bm25_search" -> ((s, d) => TextAnalysis.bm25Search(s, d)),
      "text_hybrid_retrieval" -> ((s, d) =>
        TextAnalysis.hybridRetrieval(s, d)),
      "text_chunking" -> ((s, d) => TextAnalysis.chunkTokens(s, d)),
      "text_lm_likelihood" -> ((s, d) => TextAnalysis.lmLikelihood(s, d)),
      "text_boilerplate_prefixes" -> ((s, d) =>
        TextAnalysis.boilerplatePrefixes(s, d)),
      "text_chunk_dedup_report" -> ((s, d) =>
        TextAnalysis.chunkDedupReport(s, d)),
      "text_repeated_passages" -> ((s, d) =>
        TextAnalysis.repeatedPassages(s, d)),
      "text_dup_span_mass" -> ((s, d) => TextAnalysis.dupSpanMass(s, d)),
      "text_tokenizer_fertility" -> ((s, d) =>
        TextAnalysis.tokenizerFertility(s, d)),
      "text_quality_lm_agreement" -> ((s, d) =>
        TextAnalysis.qualitySignalCorrelation(s, d)),
      "text_quality_reliability" -> ((s, d) =>
        TextAnalysis.qualityReliability(s, d)),
      "text_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(s, d)),
      // Rows-only (sketch tier, like approx_distinct/approx_quantiles):
      // CMS has no SQL twin; estimate ≥ exact is asserted in TextSpec.
      "text_heavy_hitters_cms" -> ((s, d) =>
        TextAnalysis.heavyHittersCms(s, d)),
      // Tokenizer TRAINING: K learned BPE merges, exact oracle (the same
      // K rounds unrolled in SQL, generated from the same constants) —
      // and the corpus re-tokenized under the learned vocab.
      "text_bpe_train" -> ((s, d) => BpeTrainer.trainMerges(s, d)),
      "text_bpe_encode" -> ((s, d) => BpeTrainer.encodeCounts(s, d)),
      // Deep vocabulary (K=256, batched rounds — VERDICT r12 item 2).
      // Oracle: the pinned learned table ([[adaptiveOracles]]); the
      // batched ALGORITHM is cross-engine-proven by text_bpe_train's
      // unrolled twin, which runs the same code at K=8.
      "text_bpe_train_k256" -> ((s, d) => BpeTrainer.trainMergesDeep(s, d)),
      "text_bpe_encode_k256" -> ((s, d) => BpeTrainer.encodeCountsDeep(s, d)),
      // The tokenizer APPLY: per-doc ORDERED piece sequence (U+001F
      // joined) under the K=8 vocab — the artifact a pipeline ships.
      "text_bpe_tokenize" -> ((s, d) => BpeTrainer.tokenizeDocs(s, d)),
      // The RELEASED tokenizer (round 14): merges+vocab written as a
      // re-loadable parquet artifact; the row fingerprints the read-back
      // state exactly (oracle: pinned merges + corpus-derived vocab ids).
      "text_bpe_release" -> ((s, d) => BpeTrainer.releaseReport(s, d)),
      // Learned quality model: closed-form ridge-free OLS distillation of
      // the heuristic judge into scan-time byte counters — train (exact
      // integer normal equations + bit-parity Cramer solve), per-doc
      // scoring, and the per-source gate-agreement eval.
      "quality_model_train" -> ((s, d) => QualityModel.trainReport(s, d)),
      "quality_model_score" -> ((s, d) => QualityModel.scores(s, d)),
      "quality_model_eval" -> ((s, d) => QualityModel.evalReport(s, d)),
      // Split-honest eval (round 14): fit on the train split, confusion
      // matrix on the val split only — the out-of-sample twin.
      "quality_model_eval_val" -> ((s, d) => QualityModel.evalReportVal(s, d))
    ),
    oracles = Map(
      "text_bpe_train" -> BpeTrainer.mergeOracleSql,
      "text_bpe_encode" -> BpeTrainer.encodeOracleSql,
      "text_bpe_tokenize" -> BpeTrainer.tokenizeOracleSql,
      "quality_model_train" -> QualityModel.trainOracleSql,
      "quality_model_score" -> QualityModel.scoreOracleSql,
      "quality_model_eval" -> QualityModel.evalOracleSql,
      "quality_model_eval_val" -> QualityModel.evalValOracleSql,
      "text_token_counts" ->
        s"""SELECT doc_id, len($Toks) AS n_tokens,
           |  len(regexp_extract_all(text,
           |    '${TextAnalysis.BpePattern.replace("'", "''")}')) AS n_bpe_pieces,
           |  length(text) AS n_chars_text,
           |  length(text) // 4 AS n_subwords_est
           |FROM documents ORDER BY doc_id""".stripMargin,
      // Fertility: exact integer sums per (lang, source), two final
      // double divisions — same BPE pre-tokenizer regex as token_counts.
      "text_tokenizer_fertility" ->
        s"""WITH f AS (SELECT lang, source,
           |  CAST(len($Toks) AS BIGINT) AS w,
           |  CAST(len(regexp_extract_all(text,
           |    '${TextAnalysis.BpePattern.replace("'", "''")}')) AS BIGINT)
           |    AS b,
           |  CAST(length(text) AS BIGINT) AS c
           |FROM documents)
           |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(w) AS BIGINT) AS n_words,
           |  CAST(sum(b) AS BIGINT) AS n_pieces,
           |  CAST(sum(b) AS DOUBLE) / CAST(sum(w) AS BIGINT)
           |    AS pieces_per_word,
           |  CAST(sum(c) AS DOUBLE) / CAST(sum(b) AS BIGINT)
           |    AS chars_per_piece
           |FROM f GROUP BY lang, source
           |ORDER BY lang, source""".stripMargin,
      "text_quality" ->
        s"""WITH q AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  length(replace(text, ' ', '')) AS nsp,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
           |FROM documents)
           |SELECT doc_id, n_tokens,
           |  round(nsp * 1.0 / n_tokens, 6) AS avg_token_len,
           |  round(stop_hits * 1.0 / n_tokens, 6) AS stopword_ratio,
           |  round(least(n_tokens / 100.0, 1.0) *
           |        (1.0 - stop_hits * 1.0 / n_tokens), 6) AS quality
           |FROM q ORDER BY doc_id""".stripMargin,
      "text_langid" ->
        s"""WITH h AS (SELECT doc_id, lang,
           |  len(list_filter($Toks, t -> t IN ('the','a','is','of'))) AS hits_en,
           |  len(list_filter($Toks, t -> t IN ('der','die','das','und'))) AS hits_de,
           |  len(list_filter($Toks, t -> t IN ('el','la','los','y'))) AS hits_es,
           |  len(list_filter($Toks, t -> t IN ('le','les','et','une'))) AS hits_fr
           |FROM documents),
           |m AS (SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, 0) AS mx FROM h)
           |SELECT doc_id, lang,
           |  CASE WHEN mx = 0 THEN 'unknown'
           |       WHEN hits_en = mx THEN 'en' WHEN hits_de = mx THEN 'de'
           |       WHEN hits_es = mx THEN 'es' ELSE 'fr' END AS lang_pred,
           |  mx AS marker_hits
           |FROM m ORDER BY doc_id""".stripMargin,
      "text_gopher_filters" -> (GopherFlagsSql +
        s"""
           |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
           |  n_alpha_words, n_stop_distinct, n_symbol_words,
           |  pass_word_count, pass_mean_word_len, pass_alpha,
           |  pass_stop, pass_symbol,
           |  (pass_word_count AND pass_mean_word_len AND pass_alpha
           |   AND pass_stop AND pass_symbol) AS keep
           |FROM g ORDER BY doc_id""".stripMargin),
      "text_gopher_funnel" -> (GopherFlagsSql +
        s""",
           |c AS (SELECT count(*) AS total,
           |  CAST(sum(CASE WHEN pass_word_count THEN 1 ELSE 0 END)
           |    AS BIGINT) AS s0,
           |  CAST(sum(CASE WHEN pass_word_count AND pass_mean_word_len
           |    THEN 1 ELSE 0 END) AS BIGINT) AS s1,
           |  CAST(sum(CASE WHEN pass_word_count AND pass_mean_word_len
           |    AND pass_alpha THEN 1 ELSE 0 END) AS BIGINT) AS s2,
           |  CAST(sum(CASE WHEN pass_word_count AND pass_mean_word_len
           |    AND pass_alpha AND pass_stop THEN 1 ELSE 0 END)
           |    AS BIGINT) AS s3,
           |  CAST(sum(CASE WHEN pass_word_count AND pass_mean_word_len
           |    AND pass_alpha AND pass_stop AND pass_symbol
           |    THEN 1 ELSE 0 END) AS BIGINT) AS s4
           |FROM g)
           |SELECT * FROM (
           |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'total' AS stage,
           |    total AS survivors FROM c
           |  UNION ALL SELECT 1, 'after_word_count', s0 FROM c
           |  UNION ALL SELECT 2, 'after_mean_word_len', s1 FROM c
           |  UNION ALL SELECT 3, 'after_alpha', s2 FROM c
           |  UNION ALL SELECT 4, 'after_stop', s3 FROM c
           |  UNION ALL SELECT 5, 'after_symbol', s4 FROM c
           |) ORDER BY stage_idx""".stripMargin),
      "text_fingerprint" ->
        s"""SELECT doc_id, md5(lower(trim(text))) AS fp,
           |  md5(array_to_string(($Toks)[1:8], ' ')) AS prefix_fp
           |FROM documents ORDER BY doc_id""".stripMargin,
      "text_top_terms" ->
        s"""WITH terms AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM
           |       (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |scored AS (SELECT doc_id, term,
           |    CAST(tf AS DOUBLE) * n_docs / df AS score
           |  FROM tf JOIN df USING (term), n)
           |SELECT doc_id, term, score,
           |  CAST(row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, term ASC) AS BIGINT) AS rk
           |FROM scored
           |QUALIFY rk <= 3
           |ORDER BY doc_id, rk""".stripMargin,
      "text_rolling_hash" ->
        s"""WITH h AS (SELECT doc_id,
           |    list_transform($Toks,
           |      t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)) AS hs
           |  FROM documents),
           |r AS (SELECT doc_id, hs,
           |    list_reduce(list_prepend(0::BIGINT, hs),
           |      (a, x) -> (a * 1000003 + x) % 2147483647) AS roll_full
           |  FROM h)
           |SELECT doc_id, roll_full,
           |  CASE WHEN len(hs) >= 8 THEN
           |    list_min(list_transform(generate_series(1, len(hs) - 7),
           |      i -> list_reduce(list_prepend(0::BIGINT, hs[i:i+7]),
           |             (a, x) -> (a * 1000003 + x) % 2147483647)))
           |  ELSE roll_full END AS winnow_min
           |FROM r ORDER BY doc_id""".stripMargin,
      "text_langid_ngram" -> {
        def profSql(code: String): String =
          TextAnalysis.TrigramProfiles.find(_._1 == code).get._2
            .map(s => "'" + s + "'").mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, lang, lower(trim(text)) AS tx FROM documents),
           |g AS (SELECT doc_id, lang, list_distinct(list_transform(
           |    generate_series(1, greatest(length(tx) - 2, 1)),
           |    i -> tx[i:i+2])) AS tris FROM t),
           |h AS (SELECT doc_id, lang,
           |  len(list_intersect(tris, ${profSql("en")})) AS hits_en,
           |  len(list_intersect(tris, ${profSql("de")})) AS hits_de,
           |  len(list_intersect(tris, ${profSql("es")})) AS hits_es,
           |  len(list_intersect(tris, ${profSql("fr")})) AS hits_fr
           |FROM g),
           |m AS (SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr, 0) AS mx FROM h)
           |SELECT doc_id, lang,
           |  CASE WHEN mx = 0 THEN 'unknown'
           |       WHEN hits_en = mx THEN 'en' WHEN hits_de = mx THEN 'de'
           |       WHEN hits_es = mx THEN 'es' ELSE 'fr' END AS lang_pred,
           |  CAST(mx AS BIGINT) AS ngram_hits
           |FROM m ORDER BY doc_id""".stripMargin
      },
      // Repetition fractions: exact int counts, one int/int double
      // division each → bit-identical. Nested lambdas mirror the Spark
      // selfCounts transform+filter shape.
      "text_repetition" ->
        s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
           |c AS (SELECT doc_id, toks, len(toks) AS n,
           |  list_transform(generate_series(1, len(toks) - 1),
           |    i -> toks[i] || ' ' || toks[i+1]) AS bi,
           |  list_transform(generate_series(1, len(toks) - 2),
           |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tri
           |FROM t)
           |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           |  CASE WHEN n >= 1 THEN CAST(list_max(list_transform(toks,
           |    t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / n
           |  END AS top_token_frac,
           |  CASE WHEN n >= 2 THEN CAST(list_max(list_transform(bi,
           |    t -> len(list_filter(bi, x -> x = t)))) AS DOUBLE) / (n - 1)
           |  END AS top_bigram_frac,
           |  CASE WHEN n >= 3 THEN CAST(len(list_filter(list_transform(tri,
           |    t -> len(list_filter(tri, x -> x = t))), c -> c > 1))
           |    AS DOUBLE) / (n - 2)
           |  END AS dup_trigram_frac
           |FROM c ORDER BY doc_id""".stripMargin,
      // Percentile normalization: unique (quality, doc_id) ranks →
      // percent_rank is one exact-integer division per row.
      "text_quality_percentiles" ->
        s"""WITH q AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it')))
           |    AS stop_hits
           |FROM documents),
           |s AS (SELECT doc_id,
           |  round(least(n_tokens / 100.0, 1.0) *
           |        (1.0 - stop_hits * 1.0 / n_tokens), 6) AS quality
           |FROM q)
           |SELECT doc_id, quality,
           |  percent_rank() OVER (ORDER BY quality, doc_id) AS pct_rank
           |FROM s ORDER BY doc_id""".stripMargin,
      // Redaction twin: same regexes, same fixed order, 'g' flag (DuckDB
      // replaces first-only by default; Spark replaces all).
      "text_pii_redact" ->
        s"""WITH r AS (SELECT doc_id, text,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '${TextAnalysis.EmailRe}', '[EMAIL]', 'g'),
           |    '${TextAnalysis.PhoneRe}', '[PHONE]', 'g'),
           |    '${TextAnalysis.Ipv4Re}', '[IP]', 'g') AS red
           |FROM documents)
           |SELECT doc_id, md5(red) AS redacted_fp,
           |  CAST(length(red) AS BIGINT) AS n_chars_redacted,
           |  red <> text AS changed
           |FROM r ORDER BY doc_id""".stripMargin,
      "text_pii_counts" ->
        s"""WITH p AS (SELECT doc_id,
           |  CAST(len(regexp_extract_all(text,
           |    '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(text,
           |    '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(text,
           |    '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ipv4
           |FROM documents)
           |SELECT doc_id, n_emails, n_phones, n_ipv4,
           |  (n_emails + n_phones + n_ipv4 > 0) AS has_pii
           |FROM p ORDER BY doc_id""".stripMargin,
      "text_commonness" ->
        s"""WITH terms AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
           |d AS (SELECT DISTINCT doc_id, term FROM terms),
           |df AS (SELECT term, count(*) AS df FROM d GROUP BY term)
           |SELECT doc_id, count(*) AS n_distinct,
           |  CAST(sum(df) AS BIGINT) AS df_sum,
           |  CAST(sum(df) AS DOUBLE) / count(*) AS mean_df
           |FROM d JOIN df USING (term)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "text_length_hist" ->
        """SELECT CAST(n_chars // 64 AS BIGINT) AS bucket,
          |  count(*) AS n_docs,
          |  CAST(min(n_chars) AS BIGINT) AS min_chars,
          |  CAST(max(n_chars) AS BIGINT) AS max_chars,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
      "text_vocab_coverage" ->
        s"""WITH t AS (SELECT unnest($Toks) AS term FROM documents),
           |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
           |tot AS (SELECT count(*) AS total FROM t),
           |top AS (SELECT term, cnt,
           |    CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rk
           |  FROM c QUALIFY rk <= 100)
           |SELECT rk, term, cnt,
           |  CAST(sum(cnt) OVER (ORDER BY rk) AS BIGINT) AS cum_cnt,
           |  CAST(CAST(sum(cnt) OVER (ORDER BY rk) AS BIGINT) AS DOUBLE)
           |    / (SELECT total FROM tot) AS cum_frac
           |FROM top ORDER BY rk""".stripMargin,
      "text_contamination" ->
        s"""WITH $ContaminationCtes
           |SELECT d.doc_id, coalesce(n, 0) AS n_contaminated,
           |  coalesce(n, 0) > 0 AS is_contaminated
           |FROM documents d LEFT JOIN hits USING (doc_id)
           |ORDER BY doc_id""".stripMargin,
      // Adjacent-pair zip over the shared tokenizer; n1 counts bigram
      // left slots so P(·|w1) sums to 1. Lists are 1-based on both
      // engines; the single double division is engine-portable.
      "text_bigrams" ->
        s"""WITH t AS (SELECT $Toks AS ts FROM documents),
           |bi AS MATERIALIZED (
           |  SELECT ts[i] AS w1, ts[i + 1] AS w2 FROM (
           |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
           |    FROM t WHERE len(ts) >= 2)),
           |n12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
           |n1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1)
           |SELECT w1, w2, n12, n1,
           |  CAST(n12 AS DOUBLE) / n1 AS p_cond
           |FROM n12 JOIN n1 USING (w1)
           |ORDER BY n12 DESC, w1 ASC, w2 ASC
           |LIMIT 20""".stripMargin,
      // BM25, mirrored node-for-node: exact-rational idf (the topTerms
      // ln-avoidance convention), per-term scores summed left-assoc in
      // fixed term order, and the inexact 1.2 literal forced to DOUBLE
      // on both engines so (1.2 + 1.0) is the same IEEE add (DuckDB
      // parses bare decimals as DECIMAL — its exact 2.2 re-rounds
      // differently in the last ulp than the double sum).
      "text_bm25_search" -> {
        val dfs = TextAnalysis.Bm25QueryTerms.zipWithIndex.map {
          case (t, i) =>
            s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1" +
              s" ELSE 0 END) AS BIGINT) AS df_$i"
        }
        val scores = TextAnalysis.Bm25QueryTerms.zipWithIndex.map {
          case (t, i) => bm25TermSql(t, i)
        }
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
           |  FROM d),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(dl) AS BIGINT) AS sum_dl,
           |  ${dfs.mkString(",\n|  ")}
           |  FROM dd)
           |SELECT doc_id, dl,
           |  ${scores.mkString("\n|  + ")} AS bm25
           |FROM dd, st
           |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
      },
      // Hybrid RRF retrieval: each arm is VERBATIM its standalone
      // oracle (BM25 top-20 / seed-cosine top-20), fused with the
      // rec_rrf_fusion double-arithmetic convention over the two
      // bounded survivor lists.
      "text_hybrid_retrieval" -> {
        val dfs = TextAnalysis.Bm25QueryTerms.zipWithIndex.map {
          case (t, i) =>
            s"CAST(sum(CASE WHEN list_contains(toks, '$t') THEN 1" +
              s" ELSE 0 END) AS BIGINT) AS df_$i"
        }
        val scores = TextAnalysis.Bm25QueryTerms.zipWithIndex.map {
          case (t, i) => bm25TermSql(t, i)
        }
        val cos = graft.similarity.SimilarityRegistry
          .cosSql("embedding", "se")
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
           |  FROM d),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(dl) AS BIGINT) AS sum_dl,
           |  ${dfs.mkString(",\n|  ")}
           |  FROM dd),
           |lex20 AS (SELECT doc_id,
           |  ${scores.mkString("\n|  + ")} AS bm25
           |FROM dd, st
           |ORDER BY bm25 DESC, doc_id LIMIT ${TextAnalysis.HybridKEach}),
           |lex AS (SELECT doc_id,
           |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
           |  FROM lex20),
           |s AS (SELECT embedding AS se FROM embeddings
           |  WHERE vec_id = ${TextAnalysis.HybridSeedId}),
           |vec20 AS (SELECT vec_id, $cos AS cos
           |  FROM embeddings, s WHERE vec_id <> ${TextAnalysis.HybridSeedId}
           |  ORDER BY cos DESC, vec_id ASC LIMIT ${TextAnalysis.HybridKEach}),
           |vec AS (SELECT vec_id AS doc_id,
           |  row_number() OVER (ORDER BY cos DESC, vec_id) AS r_vec
           |  FROM vec20)
           |SELECT doc_id,
           |  COALESCE(CAST(1 AS DOUBLE) / CAST(${TextAnalysis.RrfK} + r_lex AS DOUBLE),
           |    CAST(0 AS DOUBLE)) +
           |  COALESCE(CAST(1 AS DOUBLE) / CAST(${TextAnalysis.RrfK} + r_vec AS DOUBLE),
           |    CAST(0 AS DOUBLE)) AS rrf_score,
           |  CAST(CASE WHEN r_lex IS NULL THEN 0 ELSE 1 END +
           |    CASE WHEN r_vec IS NULL THEN 0 ELSE 1 END AS INTEGER)
           |    AS n_arms
           |FROM lex FULL OUTER JOIN vec USING (doc_id)
           |ORDER BY rrf_score DESC, doc_id
           |LIMIT ${TextAnalysis.HybridK}""".stripMargin
      },
      // Context-window chunker: windows of 64 tokens at stride 48, the
      // window count an integer ceil-division, list slices 1-based and
      // end-clipped on both engines.
      "text_chunking" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, len(toks) AS n FROM d),
           |w AS (SELECT doc_id, toks,
           |    unnest(generate_series(0, (greatest(n - 64, 0) + 47) // 48))
           |      AS i
           |  FROM dd)
           |SELECT doc_id, CAST(i AS BIGINT) AS chunk_ix,
           |  CAST(len(toks[i * 48 + 1 : i * 48 + 64]) AS BIGINT)
           |    AS n_chunk_tokens,
           |  array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ')
           |    AS chunk_text
           |FROM w ORDER BY doc_id, chunk_ix""".stripMargin,
      // Corpus-bigram-LM likelihood: kept in probability space (the
      // ln-avoidance convention); the per-doc mean is the canonical
      // sorted-fold, min is order-free; <2-token docs have no bigrams
      // and drop out on both engines.
      "text_lm_likelihood" ->
        s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
           |bi AS MATERIALIZED (
           |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2 FROM (
           |    SELECT doc_id, ts,
           |      unnest(generate_series(1, len(ts) - 1)) AS i
           |    FROM t WHERE len(ts) >= 2)),
           |n12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
           |n1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
           |p AS (SELECT doc_id, CAST(n12 AS DOUBLE) / n1 AS p
           |  FROM bi JOIN n12 USING (w1, w2) JOIN n1 USING (w1))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  list_sum(list_sort(list(p))) / count(*) AS mean_pcond,
           |  min(p) AS min_pcond
           |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // Heaps curve: each term counts at its first bucket; cumulative
      // window over the bounded bucket relation.
      "text_vocab_growth" ->
        s"""WITH fb AS (SELECT term, min(bucket) AS first_bucket FROM (
           |    SELECT doc_id // 64 AS bucket, unnest($Toks) AS term
           |    FROM documents) GROUP BY term),
           |nt AS (SELECT first_bucket, count(*) AS new_terms
           |       FROM fb GROUP BY first_bucket),
           |db AS (SELECT doc_id // 64 AS first_bucket, count(*) AS n_docs
           |       FROM documents GROUP BY 1)
           |SELECT db.first_bucket AS bucket, db.n_docs,
           |  coalesce(nt.new_terms, 0) AS new_terms,
           |  CAST(sum(db.n_docs) OVER (ORDER BY db.first_bucket) AS BIGINT)
           |    AS cum_docs,
           |  CAST(sum(coalesce(nt.new_terms, 0))
           |    OVER (ORDER BY db.first_bucket) AS BIGINT) AS cum_vocab
           |FROM db LEFT JOIN nt ON db.first_bucket = nt.first_bucket
           |ORDER BY bucket""".stripMargin,
      // Reliability curve: micro-unit quality deciles × the same
      // two-level chunked likelihood fold as the agreement row.
      "text_quality_reliability" ->
        s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
           |bi AS MATERIALIZED (
           |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2 FROM (
           |    SELECT doc_id, ts,
           |      unnest(generate_series(1, len(ts) - 1)) AS i
           |    FROM t WHERE len(ts) >= 2)),
           |n12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
           |n1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
           |p AS (SELECT doc_id, CAST(n12 AS DOUBLE) / n1 AS p
           |  FROM bi JOIN n12 USING (w1, w2) JOIN n1 USING (w1)),
           |lm AS (SELECT doc_id, list_sum(list_sort(list(p))) / count(*)
           |    AS mean_pcond
           |  FROM p GROUP BY doc_id),
           |qd AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it')))
           |    AS stop_hits
           |FROM documents),
           |q6t AS (SELECT doc_id,
           |  CAST(round(round(least(n_tokens / 100.0, 1.0) *
           |    (1.0 - stop_hits * 1.0 / n_tokens), 6) * 1000000.0)
           |    AS BIGINT) AS q6
           |FROM qd),
           |leaves AS (SELECT least(q6 // 100000, 9) AS quality_decile,
           |    doc_id // 1024 AS chunk, count(*) AS n,
           |    CAST(sum(q6) AS BIGINT) AS sq,
           |    list_sum(list_sort(list(mean_pcond))) AS sp
           |  FROM q6t JOIN lm USING (doc_id) GROUP BY 1, 2)
           |SELECT quality_decile, CAST(sum(n) AS BIGINT) AS n_docs,
           |  (CAST(sum(sq) AS DOUBLE) / 1000000.0) / sum(n)
           |    AS mean_quality,
           |  list_sum(list_sort(list(sp))) / sum(n) AS mean_lm_pcond
           |FROM leaves GROUP BY quality_decile
           |ORDER BY quality_decile""".stripMargin,
      // Shared first-8-token prefixes; short docs skipped (a partial
      // prefix is not template evidence) on both engines.
      "text_boilerplate_prefixes" ->
        s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
           |p AS (SELECT doc_id, array_to_string(toks[1:8], ' ') AS prefix
           |  FROM t WHERE len(toks) >= 8)
           |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
           |  min(doc_id) AS example_doc
           |FROM p GROUP BY prefix HAVING count(*) >= 2
           |ORDER BY n_docs DESC, prefix ASC LIMIT 20""".stripMargin,
      // Sliding 16-token windows at stride 4; the ≥2 gate is on
      // DISTINCT docs (cross-doc passages only), counts cast off
      // HUGEINT; passage is the group key so the order is total.
      "text_repeated_passages" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, len(toks) AS n FROM d
           |  WHERE len(toks) >= 16),
           |w AS (SELECT doc_id, toks,
           |    unnest(generate_series(0, (n - 16) // 4)) AS i
           |  FROM dd),
           |p AS (SELECT doc_id,
           |  array_to_string(toks[i * 4 + 1 : i * 4 + 16], ' ') AS passage
           |  FROM w)
           |SELECT passage, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_occurrences,
           |  min(doc_id) AS example_doc
           |FROM p GROUP BY passage HAVING count(DISTINCT doc_id) >= 2
           |ORDER BY n_docs DESC, n_occurrences DESC, passage ASC
           |LIMIT 20""".stripMargin,
      // Per-doc duplicated-span mass over the same window grammar
      // (w/s from TextAnalysis.DupSpanW/S — no twin drift); covered
      // positions unioned via count(DISTINCT pos), overlap never
      // double-counted, one exact-int division for the fraction.
      "text_dup_span_mass" -> {
        val (w, s) = (TextAnalysis.DupSpanW, TextAnalysis.DupSpanS)
        val us = (0 until w).map(u => s"($u)").mkString(", ")
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, len(toks) AS n FROM d),
           |wi AS (SELECT doc_id, toks,
           |    unnest(generate_series(0, (n - $w) // $s)) AS ix
           |  FROM dd WHERE n >= $w),
           |sp AS (SELECT doc_id, ix,
           |  md5(array_to_string(toks[ix * $s + 1 : ix * $s + $w], ' ')) AS h
           |  FROM wi),
           |dup AS (SELECT h FROM sp GROUP BY h
           |  HAVING count(DISTINCT doc_id) >= 2),
           |fl AS (SELECT doc_id, ix FROM sp JOIN dup USING (h)),
           |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
           |  FROM fl GROUP BY doc_id),
           |cov AS (SELECT doc_id,
           |  CAST(count(DISTINCT ix * $s + u) AS BIGINT) AS n_dup_tokens
           |  FROM fl, (VALUES $us) t(u) GROUP BY doc_id)
           |SELECT dd.doc_id, CAST(n AS BIGINT) AS n_tokens,
           |  coalesce(nw.n_dup_windows, 0) AS n_dup_windows,
           |  coalesce(cov.n_dup_tokens, 0) AS n_dup_tokens,
           |  CAST(coalesce(cov.n_dup_tokens, 0) AS DOUBLE) / n
           |    AS dup_token_frac
           |FROM dd LEFT JOIN nw ON dd.doc_id = nw.doc_id
           |        LEFT JOIN cov ON dd.doc_id = cov.doc_id
           |ORDER BY dd.doc_id""".stripMargin
      },
      // Chunk-stream duplication over the same 64/48 chunker; every
      // aggregate cast off HUGEINT, the fraction one exact-int division.
      "text_chunk_dedup_report" ->
        s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
           |dd AS (SELECT doc_id, toks, len(toks) AS n FROM d),
           |w AS (SELECT doc_id, toks,
           |    unnest(generate_series(0, (greatest(n - 64, 0) + 47) // 48))
           |      AS i
           |  FROM dd),
           |c AS (SELECT array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ')
           |    AS chunk_text FROM w),
           |g AS (SELECT chunk_text, count(*) AS n FROM c GROUP BY 1),
           |s AS (SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
           |  CAST(count(*) AS BIGINT) AS n_distinct,
           |  CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
           |    AS n_in_dup_groups FROM g)
           |SELECT n_chunks, n_distinct,
           |  n_chunks - n_distinct AS n_redundant,
           |  CAST(n_chunks - n_distinct AS DOUBLE) / n_chunks
           |    AS redundant_frac,
           |  n_in_dup_groups FROM s""".stripMargin,
      // Pearson r between the quality heuristic and the LM mean
      // likelihood: five moment sums through one doc_id-chunked fold
      // level (the centroid-tree posture), every partial sorted, sqrt
      // IEEE-exact on both engines.
      "text_quality_lm_agreement" ->
        s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
           |bi AS MATERIALIZED (
           |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2 FROM (
           |    SELECT doc_id, ts,
           |      unnest(generate_series(1, len(ts) - 1)) AS i
           |    FROM t WHERE len(ts) >= 2)),
           |n12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY 1, 2),
           |n1 AS (SELECT w1, count(*) AS n1 FROM bi GROUP BY 1),
           |pp AS (SELECT doc_id, CAST(n12 AS DOUBLE) / n1 AS p
           |  FROM bi JOIN n12 USING (w1, w2) JOIN n1 USING (w1)),
           |lm AS (SELECT doc_id, list_sum(list_sort(list(p))) / count(*)
           |    AS y FROM pp GROUP BY doc_id),
           |q0 AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it')))
           |    AS stop_hits FROM documents),
           |q AS (SELECT doc_id, round(least(n_tokens / 100.0, 1.0) *
           |    (1.0 - stop_hits * 1.0 / n_tokens), 6) AS x FROM q0),
           |j AS (SELECT q.doc_id, x, y FROM q JOIN lm USING (doc_id)),
           |lvl AS (SELECT doc_id // 1024 AS chunk, count(*) AS n,
           |  list_sum(list_sort(list(x))) AS sx,
           |  list_sum(list_sort(list(y))) AS sy,
           |  list_sum(list_sort(list(x * y))) AS sxy,
           |  list_sum(list_sort(list(x * x))) AS sxx,
           |  list_sum(list_sort(list(y * y))) AS syy
           |  FROM j GROUP BY 1),
           |s AS (SELECT CAST(sum(n) AS BIGINT) AS n,
           |  list_sum(list_sort(list(sx))) AS sx,
           |  list_sum(list_sort(list(sy))) AS sy,
           |  list_sum(list_sort(list(sxy))) AS sxy,
           |  list_sum(list_sort(list(sxx))) AS sxx,
           |  list_sum(list_sort(list(syy))) AS syy FROM lvl)
           |SELECT n, (n * sxy - sx * sy) /
           |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           |    AS pearson_r
           |FROM s""".stripMargin
    )
  )

  /** Index-adaptive pinned twin for the deep BPE row (the ALS/IVF
    * pinned-state pattern): the learned K=256 merge table as literal
    * VALUES — training is index-class work validated cross-engine by
    * text_bpe_train's unrolled K=8 twin (same batched code) and by
    * BpeSpec's batched≡sequential fixtures; the oracle pins the state so
    * the driver's hash gate still covers schema/order/typing drift. */
  def adaptiveOracles(spark: org.apache.spark.sql.SparkSession,
                      dir: String): Map[String, String] = {
    val rows = BpeTrainer.trainMergesDeep(spark, dir).collect()
    if (rows.isEmpty) return Map.empty
    def esc(s: String) = s.replace("'", "''")
    val values = rows.map(r =>
      s"(${r.getInt(0)}, '${esc(r.getString(1))}', '${esc(r.getString(2))}'," +
        s" ${r.getLong(3)})").mkString(",\n  ")
    // The deep-vocab ENCODE twin pins the learned (word → pieces)
    // relation instead of the merge table: the re-tokenization join is
    // recomputed by DuckDB from raw text against the pinned vocab, so
    // the row checks the serving join end-to-end, not just the state.
    // Vocabulary-sized (this corpus: ≤ a few hundred distinct words).
    val wp = BpeTrainer.deepWordPieces(spark, dir)
    val wpValues = wp.map { case (w, np) => s"('${esc(w)}', $np)" }
      .mkString(",\n  ")
    val p = TextAnalysis.BpePattern.replace("'", "''")
    Map(
      "text_bpe_train_k256" ->
        s"""SELECT CAST(step AS INTEGER) AS step, lhs, rhs,
           |  CAST(pair_count AS BIGINT) AS pair_count
           |FROM (VALUES
           |  $values) AS t(step, lhs, rhs, pair_count)
           |ORDER BY step""".stripMargin,
      "text_bpe_encode_k256" ->
        s"""WITH wc(word, np) AS (VALUES
           |  $wpValues)
           |SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(np) AS BIGINT) AS n_pieces
           |FROM (SELECT doc_id, unnest(regexp_extract_all(text, '$p'))
           |        AS word FROM documents) dw
           |JOIN wc USING (word)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // The released-artifact row: the merge table is pinned (state),
      // but the VOCAB ID ASSIGNMENT and both content fingerprints are
      // recomputed by DuckDB from the pinned merges + the raw corpus
      // (base alphabet from the same word stream) — so the oracle
      // predicts what Spark must read back from the artifact parquet.
      "text_bpe_release" -> {
        def fp(canon: String) =
          s"CAST(('0x' || substr(md5($canon), 1, 13)) AS BIGINT)"
        s"""WITH m(step, lhs, rhs, pair_count) AS (VALUES
           |  $values),
           |w AS (SELECT DISTINCT unnest(regexp_extract_all(text, '$p'))
           |      AS word FROM documents),
           |base AS (SELECT DISTINCT unnest(string_split(word, ''))
           |      AS piece FROM w),
           |mo AS (SELECT lhs || rhs AS piece, min(step) AS fs
           |       FROM m GROUP BY lhs || rhs),
           |vocab AS (
           |  SELECT CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
           |    AS piece_id, piece FROM base
           |  UNION ALL
           |  SELECT CAST((SELECT count(*) FROM base) +
           |    row_number() OVER (ORDER BY fs) - 1 AS BIGINT), piece
           |  FROM mo),
           |fpm AS (SELECT ${fp("CAST(step AS VARCHAR) || chr(31) || lhs" +
              " || chr(31) || rhs || chr(31) || CAST(pair_count AS VARCHAR)")}
           |  AS fp FROM m),
           |fpv AS (SELECT ${fp("CAST(piece_id AS VARCHAR) || chr(31)" +
              " || piece")} AS fp FROM vocab)
           |SELECT 'merges' AS part, (SELECT count(*) FROM m) AS n_rows,
           |  CAST(CAST(sum(fp) AS DECIMAL(38,0)) AS VARCHAR) AS content_fp
           |FROM fpm
           |UNION ALL
           |SELECT 'vocab' AS part, (SELECT count(*) FROM vocab) AS n_rows,
           |  CAST(CAST(sum(fp) AS DECIMAL(38,0)) AS VARCHAR) AS content_fp
           |FROM fpv
           |ORDER BY part""".stripMargin
      })
  }

  /** One BM25 term score, structured exactly like the Spark expression
    * tree in TextAnalysis.bm25Search: ((idf) * (tf · (k1+1))) / (tf +
    * k1 · ((1−b) + b · (dl / avgdl))). */
  private def bm25TermSql(t: String, i: Int): String = {
    val tf = s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)"
    val idf = s"((CAST(n_docs AS DOUBLE) - df_$i + 0.5)" +
      s" / (CAST(df_$i AS DOUBLE) + 0.5) + 1.0)"
    s"$idf * ($tf * (CAST(1.2 AS DOUBLE) + 1.0))" +
      s" / ($tf + CAST(1.2 AS DOUBLE) * ((1.0 - 0.75)" +
      s" + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))"
  }

  /** Window-fingerprint contamination CTEs ending at `hits`(doc_id, n) —
    * the twin of TextAnalysis.contaminationOf, shared with the curation
    * tier's decontamination gate. */
  private[graft] lazy val ContaminationCtes: String = {
    def fold(l: String): String =
      s"list_reduce(list_prepend(0::BIGINT, $l), (a, x) -> (a * ${TextAnalysis.RollB} + x) % ${TextAnalysis.RollM})"
    val hashList =
      s"list_transform($Toks, t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))"
    val ids = TextAnalysis.BenchmarkDocIds.mkString(", ")
    val w = TextAnalysis.RollWindow
    // ct_-prefixed names so the block composes into larger oracles
    // (curate_full) without CTE-name collisions.
    s"""ct_h AS (SELECT doc_id, $hashList AS hs FROM documents),
       |ct_w AS (SELECT doc_id, unnest(CASE WHEN len(hs) >= $w THEN
       |    list_transform(generate_series(1, len(hs) - ${w - 1}),
       |      i -> ${fold(s"hs[i:i+${w - 1}]")})
       |  ELSE CAST([] AS BIGINT[]) END) AS wh FROM ct_h),
       |ct_b AS (SELECT DISTINCT ${fold(s"hs[1:$w]")} AS wh FROM ct_h
       |      WHERE doc_id IN ($ids) AND len(hs) >= $w),
       |hits AS (SELECT doc_id, count(*) AS n FROM ct_w JOIN ct_b USING (wh)
       |         GROUP BY doc_id)""".stripMargin
  }
}

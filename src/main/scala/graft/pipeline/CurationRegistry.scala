package graft.pipeline

import graft.Registry

/** Oracle twins for the curation tier: the split hash re-derived with
  * the same ascii arithmetic, the curation filter composed from the
  * already-proven quality/langid/dedup CTE shapes. */
object CurationRegistry {

  private val Toks = raw"string_split_regex(trim(text), '\s+')"

  private def digitSql(h: String, p: Int): String =
    s"(ascii(substring($h,$p,1)) - CASE WHEN ascii(substring($h,$p,1)) >= 97 THEN 87 ELSE 48 END)"

  /** Twin of Curation.hashBucket over md5(CAST(key AS VARCHAR)). */
  private def bucketSqlOf(key: String): String = {
    val h = s"md5(CAST($key AS VARCHAR))"
    (0 until 4).map(i => s"${digitSql(h, i + 1)} * ${1 << (4 * (3 - i))}")
      .mkString("(", " + ", ") % 100")
  }

  private val BucketSql = bucketSqlOf("doc_id")

  /** Twin of Curation.splitOf over an arbitrary key expression. */
  private[graft] def splitSqlOf(key: String): String =
    s"CASE WHEN ${bucketSqlOf(key)} < 80 THEN 'train' " +
      s"WHEN ${bucketSqlOf(key)} < 90 THEN 'val' ELSE 'test' END"

  private val SplitSql =
    s"""CASE WHEN $BucketSql < 80 THEN 'train'
       |     WHEN $BucketSql < 90 THEN 'val' ELSE 'test' END""".stripMargin

  /** Shared micro-unit quality CTEs (`q6t(doc_id, q6)`) — the
    * source_mix_report convention hoisted for the drift gates. */
  private val Q6Ctes =
    s"""q AS (SELECT doc_id, len($Toks) AS n_tokens,
       |  len(list_filter($Toks,
       |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
       |FROM documents),
       |q6t AS (SELECT doc_id,
       |  CAST(round(round(least(n_tokens / 100.0, 1.0) *
       |    (1.0 - stop_hits * 1.0 / n_tokens), 6) * 1000000.0) AS BIGINT)
       |    AS q6
       |FROM q)""".stripMargin

  val registry: Registry = Registry(
    queries = Map(
      "split_counts" -> ((s, d) => Curation.splitCounts(s, d)),
      "stratified_sample" -> ((s, d) => Curation.stratifiedSample(s, d)),
      "mixture_rebalance_counts" -> ((s, d) => Curation.rebalanceCounts(s, d)),
      "mixture_temperature" -> ((s, d) => Curation.mixtureTemperature(s, d)),
      "mixture_epochs" -> ((s, d) => Curation.mixtureEpochs(s, d)),
      "curate_corpus" -> ((s, d) => Curation.curate(s, d)),
      "curate_full" -> ((s, d) => Curation.curateFull(s, d)),
      "forget_cascade" -> ((s, d) => Curation.forgetCascadeReport(s, d)),
      "mixture_quality_weighted" -> ((s, d) =>
        Curation.qualityWeightedCounts(s, d)),
      "source_mix_report" -> ((s, d) => Curation.sourceMixReport(s, d)),
      "source_cap_sample" -> ((s, d) => Curation.sourceCapSample(s, d)),
      "split_leakage" -> ((s, d) => Curation.splitLeakageReport(s, d)),
      "packing_report" -> ((s, d) => Curation.packingReport(s, d)),
      "pack_assignments" -> ((s, d) => Curation.packAssignments(s, d)),
      "quality_floor_calibration" -> ((s, d) =>
        Curation.qualityFloorCalibration(s, d)),
      "drift_split_ks" -> ((s, d) => Curation.splitDriftKs(s, d)),
      "drift_source_tv" -> ((s, d) => Curation.sourceDriftTv(s, d)),
      "split_contamination" -> ((s, d) => Curation.splitContamination(s, d)),
      "sample_weighted_pps" -> ((s, d) => Curation.weightedPpsSample(s, d)),
      "curate_token_budget" -> ((s, d) => Curation.tokenBudgetSelect(s, d)),
      "curate_release_manifest" -> ((s, d) => Curation.releaseManifest(s, d)),
      "curate_dataset_card" -> ((s, d) => Curation.datasetCard(s, d)),
      "curate_safe_splits" -> ((s, d) => Curation.safeSplits(s, d)),
      "curate_epoch_order" -> ((s, d) => Curation.epochOrder(s, d))
    ),
    oracles = Map(
      "split_counts" ->
        s"""SELECT $SplitSql AS split, lang, count(*) AS n
           |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
      "stratified_sample" ->
        """SELECT doc_id, lang FROM documents
          |QUALIFY row_number() OVER (PARTITION BY lang
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
          |ORDER BY lang, doc_id""".stripMargin,
      "mixture_rebalance_counts" ->
        s"""SELECT lang, count(*) AS n FROM documents
           |WHERE lang <> 'en' OR $BucketSql < 30
           |GROUP BY lang ORDER BY lang""".stripMargin,
      // sqrt is IEEE-correctly-rounded on both engines (the only
      // parity-safe flattening power, hence α pinned at 1/2); the
      // √-normalizer is the canonical sorted fold, total_n exact.
      "mixture_temperature" ->
        """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          |  FROM documents GROUP BY source),
          |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_n,
          |  list_sum(list_sort(list(sqrt(CAST(n_docs AS DOUBLE)))))
          |    AS total_sq FROM s)
          |SELECT source, n_docs,
          |  CAST(n_docs AS DOUBLE) / total_n AS w_prop,
          |  sqrt(CAST(n_docs AS DOUBLE)) / total_sq AS w_temp,
          |  (sqrt(CAST(n_docs AS DOUBLE)) / total_sq)
          |    / (CAST(n_docs AS DOUBLE) / total_n) AS boost
          |FROM s, t ORDER BY source""".stripMargin,
      // Epoch plan: budget·w_temp / source_tokens, same division order.
      "mixture_epochs" ->
        s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY source),
           |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  list_sum(list_sort(list(sqrt(CAST(n_docs AS DOUBLE)))))
           |    AS total_sq FROM s)
           |SELECT source, n_docs, n_tokens,
           |  sqrt(CAST(n_docs AS DOUBLE)) / total_sq AS w_temp,
           |  (2.0 * CAST(total_tokens AS DOUBLE) *
           |    (sqrt(CAST(n_docs AS DOUBLE)) / total_sq))
           |    / CAST(n_tokens AS DOUBLE) AS epochs,
           |  CASE WHEN (2.0 * CAST(total_tokens AS DOUBLE) *
           |    (sqrt(CAST(n_docs AS DOUBLE)) / total_sq))
           |    / CAST(n_tokens AS DOUBLE) > 1.0
           |    THEN 'repeat' ELSE 'subsample' END AS regime
           |FROM s, t ORDER BY source""".stripMargin,
      "curate_corpus" ->
        s"""WITH $CurateCtes
           |$CurateSelect
           |ORDER BY doc_id""".stripMargin,
      // bucket < quality*100.0 compares an exact int against the SAME
      // rounded-to-6 double both engines compute — no float hazard.
      "mixture_quality_weighted" ->
        s"""WITH q AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
           |FROM documents),
           |quality AS (SELECT doc_id,
           |  round(least(n_tokens / 100.0, 1.0) *
           |        (1.0 - stop_hits * 1.0 / n_tokens), 6) AS quality
           |FROM q)
           |SELECT lang, count(*) AS n_total,
           |  count(CASE WHEN $BucketSql < quality * 100.0 THEN 1 END) AS n_kept
           |FROM documents JOIN quality USING (doc_id)
           |GROUP BY lang ORDER BY lang""".stripMargin,
      // Quality travels as exact micro-units (round(·,6)·10⁶ is integer-
      // valued) so the per-source mean is integer-sum + two double
      // divisions — identical fp ops in both engines, no list fold.
      "source_mix_report" ->
        s"""WITH q AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
           |FROM documents),
           |q6 AS (SELECT doc_id,
           |  CAST(round(round(least(n_tokens / 100.0, 1.0) *
           |    (1.0 - stop_hits * 1.0 / n_tokens), 6) * 1000000.0) AS BIGINT)
           |    AS q6
           |FROM q)
           |SELECT d.source, count(*) AS n_docs,
           |  count(DISTINCT d.lang) AS n_langs,
           |  count(DISTINCT md5(d.text)) AS n_unique_texts,
           |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
           |  (CAST(sum(q6.q6) AS DOUBLE) / 1000000.0) / count(*)
           |    AS mean_quality
           |FROM documents d JOIN q6 USING (doc_id)
           |GROUP BY d.source ORDER BY d.source""".stripMargin,
      "source_cap_sample" ->
        """SELECT doc_id, source FROM documents
          |QUALIFY row_number() OVER (PARTITION BY source
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10
          |ORDER BY source, doc_id""".stripMargin,
      "packing_report" ->
        s"""WITH t AS (SELECT len($Toks) AS n FROM documents),
           |w AS (SELECT n, n // 64 AS bucket,
           |  CASE WHEN n = 0 THEN 0 ELSE (n + 255) // 256 END AS wins
           |FROM t)
           |SELECT bucket, count(*) AS n_docs,
           |  CAST(sum(n) AS BIGINT) AS total_tokens,
           |  CAST(sum(wins) AS BIGINT) AS n_windows,
           |  CAST(sum(wins * 256 - n) AS BIGINT) AS pad_tokens
           |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin,
      // Concat-then-chunk packing: per-split doc_id-ordered cumsum
      // (ROWS pinned on both sides; doc_id is unique but RANGE vs ROWS
      // must not be left to defaults), then pure integer div/mod.
      // Window sum(BIGINT) is HUGEINT → cast back.
      "pack_assignments" ->
        s"""WITH t AS (SELECT doc_id, $SplitSql AS split,
           |  CAST(len($Toks) AS BIGINT) AS n_tokens FROM documents),
           |c AS (SELECT doc_id, split, n_tokens,
           |  CAST(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end FROM t)
           |SELECT doc_id, split, n_tokens,
           |  (cum_end - n_tokens) // 256 AS pack_id,
           |  (cum_end - n_tokens) % 256 AS pack_offset,
           |  n_tokens > 0 AND
           |    (cum_end - 1) // 256 > (cum_end - n_tokens) // 256
           |    AS spans_packs
           |FROM c ORDER BY doc_id""".stripMargin,
      "split_leakage" ->
        s"""WITH f AS (SELECT md5(text) AS fp, $SplitSql AS split
           |           FROM documents),
           |g AS (SELECT fp, count(DISTINCT split) AS ns, count(*) AS nd
           |      FROM f GROUP BY fp)
           |SELECT count(*) AS n_fps,
           |  count(CASE WHEN ns > 1 THEN 1 END) AS n_fps_leaky,
           |  CAST(coalesce(sum(CASE WHEN ns > 1 THEN nd END), 0) AS BIGINT)
           |    AS n_docs_leaky
           |FROM g""".stripMargin,
      "quality_floor_calibration" ->
        s"""WITH q AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
           |FROM documents),
           |quality AS (SELECT doc_id,
           |  round(least(n_tokens / 100.0, 1.0) *
           |        (1.0 - stop_hits * 1.0 / n_tokens), 6) AS quality
           |FROM q),
           |r AS (SELECT quality,
           |  row_number() OVER (ORDER BY quality DESC, doc_id) AS rk
           |FROM quality),
           |n AS (SELECT count(*) AS c FROM quality)
           |SELECT keep_pct, quality AS floor FROM (
           |  SELECT 50 AS keep_pct, quality FROM r, n
           |    WHERE rk = CAST(ceil(c * 50 / 100.0) AS BIGINT)
           |  UNION ALL
           |  SELECT 80, quality FROM r, n
           |    WHERE rk = CAST(ceil(c * 80 / 100.0) AS BIGINT)
           |  UNION ALL
           |  SELECT 90, quality FROM r, n
           |    WHERE rk = CAST(ceil(c * 90 / 100.0) AS BIGINT)
           |) ORDER BY keep_pct""".stripMargin,
      // Exact two-sample KS: integer cross-product numerator (the
      // hourly_count_anomalies convention — no float before the single
      // final division), cumulative counts over the bounded micro-unit
      // quality domain.
      "drift_split_ks" ->
        s"""WITH $Q6Ctes,
           |s AS (SELECT q6, $SplitSql AS split FROM q6t),
           |f AS (SELECT q6, split FROM s WHERE split IN ('train', 'test')),
           |h AS (SELECT q6,
           |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS tr,
           |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS te
           |  FROM f GROUP BY q6),
           |c AS (SELECT
           |  CAST(sum(tr) OVER (ORDER BY q6
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS ctr,
           |  CAST(sum(te) OVER (ORDER BY q6
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS cte
           |  FROM h),
           |t AS (SELECT
           |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_train,
           |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_test
           |  FROM f)
           |SELECT n_train, n_test,
           |  CAST(max(abs(ctr * n_test - cte * n_train)) AS BIGINT) AS ks_num,
           |  CAST(max(abs(ctr * n_test - cte * n_train)) AS DOUBLE)
           |    / (n_train * n_test) AS ks
           |FROM c, t GROUP BY n_train, n_test""".stripMargin,
      // Per-source total-variation distance vs the rest of the corpus:
      // exact integer decile counts, two divisions per bin, ½-sum via
      // the canonical sorted fold; bins DENSE through the sources×10
      // cross join.
      "drift_source_tv" ->
        s"""WITH $Q6Ctes,
           |d AS (SELECT doc.source, least(q6 // 100000, 9) AS dc
           |  FROM documents doc JOIN q6t USING (doc_id)),
           |srcs AS (SELECT DISTINCT source FROM d),
           |bins AS (SELECT unnest(generate_series(0, 9)) AS dc),
           |cnt AS (SELECT source, dc, CAST(count(*) AS BIGINT) AS n_sd
           |  FROM d GROUP BY 1, 2),
           |fl AS (SELECT s.source, b.dc, coalesce(c.n_sd, 0) AS n_sd
           |  FROM srcs s CROSS JOIN bins b
           |  LEFT JOIN cnt c ON c.source = s.source AND c.dc = b.dc),
           |dt AS (SELECT dc, CAST(count(*) AS BIGINT) AS n_d
           |  FROM d GROUP BY 1),
           |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           |  FROM d GROUP BY 1),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
           |x AS (SELECT f.source, st.n_s,
           |    abs(CAST(f.n_sd AS DOUBLE) / st.n_s
           |      - CAST(coalesce(dt.n_d, 0) - f.n_sd AS DOUBLE)
           |        / (t.n - st.n_s)) AS xd
           |  FROM fl f JOIN st USING (source)
           |  LEFT JOIN dt ON dt.dc = f.dc CROSS JOIN t)
           |SELECT source, n_s AS n_docs,
           |  list_sum(list_sort(list(xd))) * 0.5 AS tv
           |FROM x GROUP BY source, n_s ORDER BY source""".stripMargin,
      // Semantic leakage across the deterministic splits: the
      // SimilarityRegistry pair CTEs (signatures → bands → verified
      // pairs at 0.4) symmetrized, endpoints classified by the split
      // hash over vec_id.
      "split_contamination" -> {
        s"""WITH ${graft.similarity.SimilarityRegistry.PairCtes},
           |pv AS (SELECT p.d1, p.d2, v.cos FROM pairs p
           |  JOIN ver v ON v.d1 = p.d1 AND v.d2 = p.d2),
           |sym AS (SELECT d1, d2, cos FROM pv
           |  UNION ALL SELECT d2 AS d1, d1 AS d2, cos FROM pv),
           |hits AS (SELECT d1, d2, cos FROM sym
           |  WHERE ${splitSqlOf("d1")} = 'test'
           |    AND ${splitSqlOf("d2")} = 'train')
           |SELECT d1 AS test_vec_id,
           |  CAST(count(*) AS BIGINT) AS n_train_dups,
           |  max(cos) AS max_cos
           |FROM hits GROUP BY d1 ORDER BY test_vec_id""".stripMargin
      },
      // The full release gate: curate_corpus's three text gates + the
      // near-dup representative drop (SimilarityRegistry's assignment
      // propagation, vec_id ↔ doc_id) + the contamination gate
      // (TextRegistry's window-fingerprint CTEs).
      // Deletion-cohort cascade; one LEFT-JOIN-and-count-misses pass per
      // table, the same md5-bucket arithmetic as the split twins.
      "forget_cascade" -> {
        val bucket = {
          val h = "md5(CAST(c_custkey AS VARCHAR))"
          (0 until 4).map(i => s"${digitSql(h, i + 1)} * ${1 << (4 * (3 - i))}")
            .mkString("(", " + ", ") % 100")
        }
        s"""WITH victims AS MATERIALIZED (
           |  SELECT c_custkey AS uid FROM customer WHERE $bucket < 5),
           |vorders AS MATERIALIZED (
           |  SELECT o_orderkey AS vok FROM orders
           |  JOIN victims ON o_custkey = uid)
           |SELECT 'customer' AS tbl, count(*) AS n_before,
           |  count(CASE WHEN v.uid IS NULL THEN 1 END) AS n_after
           |FROM customer LEFT JOIN victims v ON c_custkey = v.uid
           |UNION ALL
           |SELECT 'orders', count(*),
           |  count(CASE WHEN v.uid IS NULL THEN 1 END)
           |FROM orders LEFT JOIN victims v ON o_custkey = v.uid
           |UNION ALL
           |SELECT 'lineitem', count(*),
           |  count(CASE WHEN vo.vok IS NULL THEN 1 END)
           |FROM lineitem LEFT JOIN vorders vo ON l_orderkey = vo.vok
           |UNION ALL
           |SELECT 'events', count(*),
           |  count(CASE WHEN v.uid IS NULL THEN 1 END)
           |FROM events LEFT JOIN victims v ON user_id = v.uid
           |ORDER BY tbl""".stripMargin
      },
      "curate_full" ->
        s"""WITH $CurateCtes,
           |${graft.similarity.SimilarityRegistry.dupAssignCtes(
                graft.similarity.SimilarityRegistry.DupRounds)},
           |nd_drop AS (SELECT id AS doc_id
           |  FROM c${graft.similarity.SimilarityRegistry.DupRounds}
           |  WHERE id <> comp),
           |${graft.text.TextRegistry.ContaminationCtes}
           |$CurateSelect
           |  AND doc_id NOT IN (SELECT doc_id FROM nd_drop)
           |  AND doc_id NOT IN (SELECT doc_id FROM hits WHERE n > 0)
           |ORDER BY doc_id""".stripMargin,
      // DuckDB window sum(BIGINT) is HUGEINT; cw/tw stay internal to the
      // integer-division filter (exact in both engines), and the emitted
      // w is cast back to BIGINT per the established convention.
      "sample_weighted_pps" ->
        """WITH d AS (SELECT doc_id, source, n_chars + 1 AS w,
          |  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
          |c AS (SELECT doc_id, source, w,
          |  sum(w) OVER (PARTITION BY source ORDER BY h, doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          |  sum(w) OVER (PARTITION BY source) AS tw
          |FROM d)
          |SELECT source, doc_id, CAST(w AS BIGINT) AS w FROM c
          |WHERE ((cw - w) * 20) // tw < (cw * 20) // tw
          |ORDER BY source, doc_id""".stripMargin,
      "curate_token_budget" ->
        s"""WITH $Q6Ctes,
           |sel AS (SELECT d.lang, q.doc_id, q.n_tokens,
           |  sum(q.n_tokens) OVER (PARTITION BY d.lang
           |    ORDER BY q6t.q6 DESC, q.doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |FROM documents d JOIN q ON d.doc_id = q.doc_id
           |                 JOIN q6t ON d.doc_id = q6t.doc_id)
           |SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(cum AS BIGINT) AS cum_tokens
           |FROM sel WHERE cum <= 5000
           |ORDER BY lang, cum_tokens, doc_id""".stripMargin,
      // Same release set as curate_full; the 52-bit md5-prefix value is
      // the shared ascii-digit arithmetic, summed (order-independent).
      "curate_release_manifest" -> {
        val fp52 = (0 until 13)
          .map(i => s"CAST(${digitSql("hh", i + 1)} AS BIGINT) * ${1L << (4 * (12 - i))}")
          .mkString(" + ")
        s"""WITH $CurateCtes,
           |${graft.similarity.SimilarityRegistry.dupAssignCtes(
                graft.similarity.SimilarityRegistry.DupRounds)},
           |nd_drop AS (SELECT id AS doc_id
           |  FROM c${graft.similarity.SimilarityRegistry.DupRounds}
           |  WHERE id <> comp),
           |${graft.text.TextRegistry.ContaminationCtes},
           |rel AS (
           |$CurateSelect
           |  AND doc_id NOT IN (SELECT doc_id FROM nd_drop)
           |  AND doc_id NOT IN (SELECT doc_id FROM hits WHERE n > 0)),
           |fp AS (SELECT doc_id, $fp52 AS fp52
           |       FROM (SELECT doc_id, md5(text) AS hh FROM documents))
           |SELECT rel.split, d.lang, count(*) AS n_docs,
           |  CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(CAST(sum(fp.fp52) AS DECIMAL(38,0)) AS VARCHAR) AS content_fp
           |FROM rel JOIN documents d ON rel.doc_id = d.doc_id
           |         JOIN q ON rel.doc_id = q.doc_id
           |         JOIN fp ON rel.doc_id = fp.doc_id
           |GROUP BY rel.split, d.lang
           |ORDER BY split, lang""".stripMargin
      },
      // Release datasheet: per split, volume / language spread /
      // exact-dup mass / mean quality / PII incidence / Gopher keeps —
      // composed from the same flag, quality, and PII CTEs the
      // standalone oracles use.
      "curate_dataset_card" -> (graft.text.TextRegistry.GopherFlagsSql +
        s""",
           |$Q6Ctes,
           |pii AS (SELECT doc_id,
           |  (len(regexp_extract_all(text,
           |     '${graft.text.TextAnalysis.EmailRe}'))
           |   + len(regexp_extract_all(text,
           |     '${graft.text.TextAnalysis.PhoneRe}'))
           |   + len(regexp_extract_all(text,
           |     '${graft.text.TextAnalysis.Ipv4Re}')) > 0) AS has_pii
           |FROM documents),
           |base AS (SELECT doc_id, lang, $SplitSql AS split,
           |  md5(text) AS fp, len($Toks) AS n_toks FROM documents),
           |jj AS (SELECT b.split, b.lang, b.fp, b.n_toks, q6t.q6,
           |    pii.has_pii,
           |    (g.pass_word_count AND g.pass_mean_word_len AND g.pass_alpha
           |     AND g.pass_stop AND g.pass_symbol) AS keep
           |  FROM base b JOIN q6t USING (doc_id) JOIN pii USING (doc_id)
           |              JOIN g USING (doc_id)),
           |per AS (SELECT split, count(*) AS n_docs,
           |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |    count(*) - count(DISTINCT fp) AS n_dup_docs,
           |    (CAST(sum(q6) AS DOUBLE) / 1000000.0) / count(*)
           |      AS mean_quality,
           |    CAST(sum(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_pii_docs,
           |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_gopher_keep
           |  FROM jj GROUP BY split),
           |lc AS (SELECT split, lang, count(*) AS c FROM jj GROUP BY 1, 2),
           |top AS (SELECT split, lang AS top_lang, c FROM lc
           |  QUALIFY row_number() OVER (PARTITION BY split
           |    ORDER BY c DESC, lang) = 1)
           |SELECT per.split, n_docs, n_tokens, n_langs,
           |  CAST(n_dup_docs AS BIGINT) AS n_dup_docs, mean_quality,
           |  top_lang, CAST(c AS DOUBLE) / n_docs AS top_lang_share,
           |  n_pii_docs, n_gopher_keep
           |FROM per JOIN top ON per.split = top.split
           |ORDER BY per.split""".stripMargin),
      // Leakage-safe splits: the doc's near-dup cluster representative
      // (the dedup_minhash_clusters min-label chain) is the split key;
      // singletons fall back to their own id — the plain split rule.
      "curate_safe_splits" ->
        s"""WITH ${graft.dedup.DedupRegistry.minhashClusterCtes(5)},
           |rep AS (SELECT d.doc_id,
           |    coalesce(c.comp, d.doc_id) AS split_key
           |  FROM documents d LEFT JOIN c5 c ON c.id = d.doc_id)
           |SELECT doc_id, split_key,
           |  ${splitSqlOf("split_key")} AS split
           |FROM rep ORDER BY doc_id""".stripMargin,
      // Epoch shuffle order over the released (five-gate) set: global
      // row_number in md5(seed|doc_id) order — the seed comes from
      // Curation.EpochShuffleSeed, shared with the Spark closure.
      "curate_epoch_order" ->
        s"""WITH $CurateCtes,
           |${graft.similarity.SimilarityRegistry.dupAssignCtes(
                graft.similarity.SimilarityRegistry.DupRounds)},
           |nd_drop AS (SELECT id AS doc_id
           |  FROM c${graft.similarity.SimilarityRegistry.DupRounds}
           |  WHERE id <> comp),
           |${graft.text.TextRegistry.ContaminationCtes},
           |rel AS (
           |$CurateSelect
           |  AND doc_id NOT IN (SELECT doc_id FROM nd_drop)
           |  AND doc_id NOT IN (SELECT doc_id FROM hits WHERE n > 0)),
           |keyed AS (SELECT doc_id,
           |  md5('${Curation.EpochShuffleSeed}|' || CAST(doc_id AS VARCHAR))
           |    AS shuffle_key
           |  FROM rel)
           |SELECT doc_id, shuffle_key,
           |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
           |    AS BIGINT) AS epoch_pos
           |FROM keyed ORDER BY epoch_pos""".stripMargin
    )
  )

  /** Quality × language × exact-dedup CTE block, ending at `quality`,
    * `lang`, `keep` — shared by curate_corpus and curate_full. */
  private lazy val CurateCtes: String =
    s"""q AS (SELECT doc_id, len($Toks) AS n_tokens,
       |  len(list_filter($Toks,
       |    t -> t IN ('the','a','of','and','to','in','is','it'))) AS stop_hits
       |FROM documents),
       |quality AS (SELECT doc_id,
       |  round(least(n_tokens / 100.0, 1.0) *
       |        (1.0 - stop_hits * 1.0 / n_tokens), 6) AS quality
       |FROM q),
       |h AS (SELECT doc_id,
       |  len(list_filter($Toks, t -> t IN ('the','a','is','of'))) AS hits_en,
       |  len(list_filter($Toks, t -> t IN ('der','die','das','und'))) AS hits_de,
       |  len(list_filter($Toks, t -> t IN ('el','la','los','y'))) AS hits_es,
       |  len(list_filter($Toks, t -> t IN ('le','les','et','une'))) AS hits_fr
       |FROM documents),
       |m AS (SELECT doc_id, greatest(hits_en, hits_de, hits_es, hits_fr, 0) AS mx,
       |  hits_en, hits_de, hits_es FROM h),
       |lang AS (SELECT doc_id,
       |  CASE WHEN mx = 0 THEN 'unknown'
       |       WHEN hits_en = mx THEN 'en' WHEN hits_de = mx THEN 'de'
       |       WHEN hits_es = mx THEN 'es' ELSE 'fr' END AS lang_pred
       |FROM m),
       |keep AS (SELECT min(doc_id) AS doc_id FROM documents
       |         GROUP BY md5(lower(trim(text))))""".stripMargin

  private lazy val CurateSelect: String =
    s"""SELECT q2.doc_id, q2.quality, $SplitSql AS split
       |FROM quality q2
       |JOIN lang USING (doc_id)
       |JOIN keep USING (doc_id)
       |JOIN documents USING (doc_id)
       |WHERE lang_pred = 'en' AND quality >= 0.5""".stripMargin
}

package graft.dedup

import graft.Registry

/** Registry + DuckDB oracle twins for the dedup tier (north-star
  * training-data operators, BASELINE.json). The md5-based MinHash makes
  * even the LSH pipeline exactly oracle-checkable. SimHash splits in
  * two rows so the bench measures the ENGINE, not the oracle shim:
  * `dedup_simhash` runs the production codegen'd xxhash64 expression
  * (rows-only — DuckDB has no xxhash64, so no SQL twin can exist;
  * FunctionsSpec asserts bit-parity against the builtin-fold
  * formulation), while `dedup_simhash_md5` is the md5-derived exact
  * oracle twin of the same vote/sign pipeline, hash-checked end-to-end.
  *
  * The oracle SQL re-derives the same shingles / signatures / band keys
  * with DuckDB list functions, so every intermediate (min-hash string,
  * band md5, candidate pair, jaccard double) is bit-identical.
  */
object DedupRegistry {

  /** DuckDB tokenizer twin of TextAnalysis.tokens. */
  private val Toks = raw"string_split_regex(trim(text), '\s+')"

  /** Twin of Dedup.simhashesMd5: hex digit p of the token's md5, via the
    * same ascii arithmetic. */
  private def digitSql(p: Int): String =
    s"(ascii(substring(h,$p,1)) - CASE WHEN ascii(substring(h,$p,1)) >= 97 THEN 87 ELSE 48 END)"

  private val VoteCols = (0 until 64).map { b =>
    s"sum(((${digitSql(1 + b / 2)} >> ${b % 2}) & 1) * 2 - 1) AS v$b"
  }.mkString(", ")

  /** Disjoint powers, ascending (bit 63's Long.MinValue addend last) —
    * same overflow-free order as the Spark fold. */
  private val FpSql = (0 until 64).map { b =>
    s"(CASE WHEN coalesce(v$b, 0) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" + ")

  private val SimhashCtes =
    s"""toks AS (SELECT doc_id, md5(unnest($Toks)) AS h FROM documents),
       |votes AS (SELECT doc_id, $VoteCols FROM toks GROUP BY doc_id),
       |fp AS (SELECT d.doc_id, $FpSql AS simhash
       |       FROM documents d LEFT JOIN votes USING (doc_id))""".stripMargin

  /** DuckDB shingle CTEs twin of Dedup.shingles (ShingleN = 3). */
  private val ShingleCtes =
    s"""toks AS (SELECT doc_id, $Toks AS t FROM documents),
       |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
       |        FROM toks WHERE len(t) >= 3),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       |       FROM idx),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Exact-jaccard verification as a CTE chain over a `cand(d1,d2)` CTE
    * — twin of Dedup.verifyJaccard, shared by every MinHash oracle so
    * the threshold logic cannot diverge between them. Produces `ver`. */
  private def verifyCtes(threshold: Double): String =
    s"""common AS (
       |  SELECT c.d1, c.d2, count(*) AS c
       |  FROM cand c JOIN sh a ON a.doc_id = c.d1
       |              JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
       |  GROUP BY c.d1, c.d2),
       |ver AS MATERIALIZED (
       |  SELECT d1, d2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jacc
       |  FROM common JOIN sizes n1 ON n1.doc_id = d1
       |              JOIN sizes n2 ON n2.doc_id = d2
       |  WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= $threshold)""".stripMargin

  /** Twin of Dedup.minhashSignatures: 16 per-doc min-hashes. */
  private val SigCols = (0 until Dedup.NumHashes)
    .map(i => s"min(md5('$i|' || s)) AS h$i").mkString(", ")

  /** Twin of the banded bucket explode (8 bands × 2 rows) — UNION ALL per
    * band (DuckDB VALUES can't reference lateral columns). */
  private val BandSelects = {
    val rpb = Dedup.NumHashes / Dedup.Bands
    (0 until Dedup.Bands).map { b =>
      val parts = (0 until rpb).map(r => s"h${b * rpb + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS key FROM sig"
    }.mkString(" UNION ALL ")
  }

  /** Shared MinHash candidate chain (signatures → banded buckets →
    * distinct bucket-collision pairs), twin of Dedup.minhashLshPairs'
    * candidate stage. */
  private def candCtes: String =
    s"""sig AS (SELECT doc_id, $SigCols FROM sh GROUP BY doc_id),
       |buckets AS ($BandSelects),
       |cand AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
       |         FROM buckets b1 JOIN buckets b2
       |           ON b1.band = b2.band AND b1.key = b2.key
       |          AND b1.doc_id < b2.doc_id)""".stripMargin

  /** The benchmark id set, inlined for the decontamination oracle. */
  private val BenchIds =
    graft.text.TextAnalysis.BenchmarkDocIds.mkString(", ")

  /** CTE chain: MinHash verified pairs → symmetrized edge set → unrolled
    * min-label rounds c0..cN (twin of GraphAlgs.pairComponents over
    * Dedup.minhashLshPairs). */
  private[graft] def minhashClusterCtes(rounds: Int): String = {
    val head =
      s"""$ShingleCtes,
         |$candCtes,
         |${verifyCtes(0.8)},
         |und AS MATERIALIZED (SELECT d1, d2 FROM ver
         |  UNION ALL SELECT d2, d1 FROM ver),
         |c0 AS MATERIALIZED (SELECT DISTINCT d1 AS id, d1 AS comp FROM und)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT id, min(comp) AS comp FROM (
         |  SELECT id, comp FROM c${i - 1}
         |  UNION ALL
         |  SELECT u.d2 AS id, c.comp FROM und u JOIN c${i - 1} c ON c.id = u.d1
         |) GROUP BY id)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  val registry: Registry = Registry(
    queries = Map(
      "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
      "dedup_token_set" -> ((s, d) => Dedup.tokenSetDups(s, d)),
      "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
      "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
      "dedup_cross_source_matrix" -> ((s, d) =>
        Dedup.crossSourceMatrix(s, d)),
      "dedup_minhash_clusters" -> ((s, d) => Dedup.minhashClusters(s, d)),
      "dedup_near_contamination" -> ((s, d) => Dedup.nearContamination(s, d)),
      "dedup_simhash" -> ((s, d) => Dedup.simhashes(s, d).orderBy("doc_id")),
      "dedup_simhash_md5" -> ((s, d) => Dedup.simhashesMd5(s, d)),
      // Oracle-green audit fencing the native xxhash64 row (round 14):
      // multiset-class uniformity theorems + an independent cross-engine
      // recompute of the md5 scheme's class uniformity.
      "dedup_simhash_audit" -> ((s, d) => Dedup.simhashAudit(s, d)),
      "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairsMd5(s, d)),
      "dedup_normalized" -> ((s, d) => Dedup.normalizedDedupReport(s, d)),
      "dedup_incremental" -> ((s, d) => Dedup.incrementalDedup(s, d)),
      "dedup_quality_keepers" -> ((s, d) => Dedup.qualityKeepers(s, d)),
      "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
      "dedup_threshold_sweep" -> ((s, d) => Dedup.thresholdSweep(s, d))
    ),
    oracles = Map(
      "dedup_exact" ->
        """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
          |FROM documents GROUP BY md5(lower(trim(text)))
          |ORDER BY keep_doc_id""".stripMargin,
      // regexp_replace is global in DuckDB only with 'g'; the class
      // [^a-z0-9]+ is identical in Java regex and RE2.
      "dedup_normalized" ->
        """WITH f AS (SELECT md5(lower(trim(text))) AS e,
          |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
          |    AS nrm
          |FROM documents)
          |SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(DISTINCT e) AS BIGINT) AS n_exact,
          |  CAST(count(DISTINCT nrm) AS BIGINT) AS n_normalized,
          |  CAST(count(DISTINCT e) - count(DISTINCT nrm) AS BIGINT)
          |    AS n_merged
          |FROM f""".stripMargin,
      "dedup_token_set" ->
        s"""SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
           |FROM documents
           |GROUP BY md5(array_to_string(list_sort(list_distinct($Toks)), ' '))
           |HAVING count(*) > 1
           |ORDER BY keep_doc_id""".stripMargin,
      "dedup_ngram_jaccard" ->
        s"""WITH $ShingleCtes,
           |rare AS (SELECT s FROM sh GROUP BY s
           |         HAVING count(*) BETWEEN 2 AND ${Dedup.DfCap}),
           |j AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
           |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           |           FROM j a JOIN j b USING (s)
           |           WHERE a.doc_id < b.doc_id
           |           GROUP BY 1, 2)
           |SELECT d1, d2, CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jacc
           |FROM common JOIN sizes n1 ON n1.doc_id = d1
           |            JOIN sizes n2 ON n2.doc_id = d2
           |WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.8
           |ORDER BY d1, d2""".stripMargin,
      "dedup_minhash_lsh" ->
        s"""WITH $ShingleCtes,
           |$candCtes,
           |${verifyCtes(0.8)}
           |SELECT d1, d2, jacc FROM ver ORDER BY d1, d2""".stripMargin,
      // Verified pairs attributed to their unordered source combination.
      "dedup_cross_source_matrix" ->
        s"""WITH $ShingleCtes,
           |$candCtes,
           |${verifyCtes(0.8)}
           |SELECT least(da.source, db.source) AS source_a,
           |  greatest(da.source, db.source) AS source_b,
           |  count(*) AS n_pairs
           |FROM ver JOIN documents da ON ver.d1 = da.doc_id
           |         JOIN documents db ON ver.d2 = db.doc_id
           |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
      // Verified near-dup pairs with exactly one side in the benchmark
      // id set — the fuzzy decontamination gate.
      "dedup_near_contamination" ->
        s"""WITH $ShingleCtes,
           |$candCtes,
           |${verifyCtes(0.8)}
           |SELECT CASE WHEN d1 IN ($BenchIds) THEN d2 ELSE d1 END AS doc_id,
           |  CASE WHEN d1 IN ($BenchIds) THEN d1 ELSE d2 END
           |    AS benchmark_doc_id,
           |  jacc
           |FROM ver
           |WHERE (d1 IN ($BenchIds)) <> (d2 IN ($BenchIds))
           |ORDER BY doc_id, benchmark_doc_id""".stripMargin,
      // Unrolled min-label rounds over the verified pair set — the same
      // bounded-round semantics the Spark loop computes (the
      // sim_dup_clusters pattern, over MinHash text pairs).
      "dedup_minhash_clusters" ->
        s"""WITH ${minhashClusterCtes(5)}
           |SELECT comp AS keep_doc_id,
           |  CAST(count(*) AS BIGINT) AS n_members
           |FROM c5 GROUP BY comp HAVING count(*) > 1
           |ORDER BY keep_doc_id""".stripMargin,
      "dedup_simhash_md5" ->
        s"""WITH $SimhashCtes
           |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,
      // native_uniform_classes states the multiset-invariance THEOREM
      // (= n_classes) the native xxhash64 fingerprints must satisfy;
      // md5_uniform_classes is genuinely recomputed from the md5 vote
      // pipeline; tokenless_nonallones is the zero-vote fixed point.
      "dedup_simhash_audit" ->
        s"""WITH $SimhashCtes,
           |cls AS (SELECT doc_id,
           |    array_to_string(list_transform(list_sort($Toks),
           |      t -> concat(CAST(len(t) AS VARCHAR), ':', t)),
           |      chr(31)) AS cls,
           |    len($Toks) = 0 AS tokenless
           |  FROM documents),
           |m AS (SELECT c.cls, f.simhash
           |      FROM cls c JOIN fp f USING (doc_id)),
           |mu AS (SELECT cls, min(simhash) = max(simhash) AS u
           |       FROM m GROUP BY cls)
           |SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           |  (SELECT CAST(count(DISTINCT cls) AS BIGINT) FROM cls)
           |    AS n_classes,
           |  (SELECT CAST(count(DISTINCT cls) AS BIGINT) FROM cls)
           |    AS native_uniform_classes,
           |  (SELECT CAST(count(*) AS BIGINT) FROM mu WHERE u)
           |    AS md5_uniform_classes,
           |  CAST(0 AS BIGINT) AS tokenless_nonallones""".stripMargin,
      // One verified relation at the lowest threshold; each threshold
      // row is a conditional count over it. Thresholds come from
      // Dedup.SweepThresholds — the same default the Spark closure
      // uses — so the twin cannot drift.
      "dedup_threshold_sweep" -> {
        val ts = Dedup.SweepThresholds.sorted
        def row(t: Double): String =
          s"""SELECT CAST($t AS DOUBLE) AS threshold,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  (SELECT CAST(count(DISTINCT d) AS BIGINT) FROM (
             |     SELECT d1 AS d FROM ver WHERE jacc >= $t
             |     UNION SELECT d2 FROM ver WHERE jacc >= $t))
             |    AS n_docs_affected
             |FROM ver WHERE jacc >= $t""".stripMargin
        s"""WITH $ShingleCtes,
           |$candCtes,
           |${verifyCtes(ts.min)}
           |SELECT * FROM (
           |${ts.map(row).mkString("\nUNION ALL\n")}
           |) ORDER BY threshold""".stripMargin
      },
      // Asymmetric containment over the shared candidate relation:
      // ordered (inner, outer) by size, Jaccard-missed pairs only.
      "dedup_containment" ->
        s"""WITH $ShingleCtes,
           |rare AS (SELECT s FROM sh GROUP BY s
           |         HAVING count(*) BETWEEN 2 AND ${Dedup.DfCap}),
           |j AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
           |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           |           FROM j a JOIN j b USING (s)
           |           WHERE a.doc_id < b.doc_id
           |           GROUP BY 1, 2),
           |scored AS (SELECT d1, d2, c, n1.n AS n1, n2.n AS n2,
           |    CAST(c AS DOUBLE) / (n1.n + n2.n - c) AS jacc
           |  FROM common JOIN sizes n1 ON n1.doc_id = d1
           |              JOIN sizes n2 ON n2.doc_id = d2
           |  WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) < 0.8)
           |SELECT CASE WHEN n1 <= n2 THEN d1 ELSE d2 END AS inner_doc,
           |  CASE WHEN n1 <= n2 THEN d2 ELSE d1 END AS outer_doc,
           |  CAST(c AS DOUBLE) / least(n1, n2) AS containment, jacc
           |FROM scored
           |WHERE CAST(c AS DOUBLE) / least(n1, n2) >= 0.9
           |ORDER BY inner_doc, outer_doc""".stripMargin,
      // Quality-aware keeper: per >1-member cluster, the max-q6 member
      // (ties to smaller id) vs the min-id convention.
      "dedup_quality_keepers" ->
        s"""WITH ${minhashClusterCtes(5)},
           |sized AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members
           |  FROM c5 GROUP BY comp HAVING count(*) > 1),
           |qd AS (SELECT doc_id, len($Toks) AS n_tokens,
           |  len(list_filter($Toks,
           |    t -> t IN ('the','a','of','and','to','in','is','it')))
           |    AS stop_hits
           |FROM documents),
           |q6t AS (SELECT doc_id,
           |  CAST(round(round(least(n_tokens / 100.0, 1.0) *
           |    (1.0 - stop_hits * 1.0 / n_tokens), 6) * 1000000.0)
           |    AS BIGINT) AS q6
           |FROM qd)
           |SELECT comp AS min_id_keeper, id AS quality_keeper, q6,
           |  n_members, id <> comp AS overturned
           |FROM (SELECT s.comp, m.id, q6t.q6, s.n_members,
           |    row_number() OVER (PARTITION BY s.comp
           |      ORDER BY q6t.q6 DESC, m.id) AS rk
           |  FROM c5 m JOIN sized s USING (comp)
           |           JOIN q6t ON q6t.doc_id = m.id)
           |WHERE rk = 1 ORDER BY min_id_keeper""".stripMargin,
      // Incremental batch gate: new = top fifth of the id range; exact
      // via fingerprint semi-join, near via the verified pair set
      // restricted to old→new pairs (same pair-local verify).
      "dedup_incremental" ->
        s"""WITH $ShingleCtes,
           |$candCtes,
           |${verifyCtes(0.8)},
           |mx AS (SELECT (max(doc_id) * 4) // 5 AS cut FROM documents),
           |newd AS (SELECT doc_id, md5(lower(trim(text))) AS fp
           |         FROM documents, mx WHERE doc_id > cut),
           |oldd AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
           |         FROM documents, mx WHERE doc_id <= cut),
           |ex AS (SELECT DISTINCT n.doc_id FROM newd n
           |       JOIN oldd o USING (fp)),
           |near AS (SELECT DISTINCT v.d2 AS doc_id FROM ver v, mx
           |         WHERE v.d1 <= cut AND v.d2 > cut)
           |SELECT n.doc_id,
           |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           |       WHEN near.doc_id IS NOT NULL THEN 'near_dup'
           |       ELSE 'unique' END AS verdict
           |FROM newd n LEFT JOIN ex ON n.doc_id = ex.doc_id
           |            LEFT JOIN near ON n.doc_id = near.doc_id
           |ORDER BY n.doc_id""".stripMargin,
      "dedup_simhash_pairs" ->
        s"""WITH $SimhashCtes,
           |chunks AS (SELECT doc_id, simhash, c.chunk,
           |             (simhash >> (c.chunk * 16)) & 65535 AS val
           |           FROM fp, (VALUES (0), (1), (2), (3)) c(chunk)),
           |cand AS (SELECT DISTINCT c1.doc_id AS d1, c2.doc_id AS d2,
           |             c1.simhash AS s1, c2.simhash AS s2
           |         FROM chunks c1 JOIN chunks c2
           |           ON c1.chunk = c2.chunk AND c1.val = c2.val
           |          AND c1.doc_id < c2.doc_id)
           |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS dist
           |FROM cand WHERE bit_count(xor(s1, s2)) <= 3
           |ORDER BY d1, d2""".stripMargin
    )
  )
}

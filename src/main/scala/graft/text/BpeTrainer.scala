package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed BPE merge training — the tokenizer-TRAINING side of the
  * text tier (counting/fertility measure an existing tokenizer; this
  * learns one from the corpus).
  *
  * Standard byte-pair-encoding over the corpus's word-frequency table:
  * pre-tokenize with [[TextAnalysis.BpePattern]] (the GPT-2-style regex
  * both engines already share), explode each distinct piece into
  * characters weighted by its frequency, then K times: count adjacent
  * symbol pairs, take the argmax (count desc, then lexical — fully
  * deterministic), and apply the merge greedily left-to-right.
  *
  * The greedy apply is the part that looks sequential but is not: a merge
  * of (a,b) can only overlap itself when a == b, and then candidate
  * positions form consecutive RUNS in which greedy takes every second
  * candidate. So "apply one merge pass" is window arithmetic — candidates
  * (sym, lead(sym)) = (a,b), run-grouped by `pos - row_number()`, taken at
  * odd in-run index, the taken position emitting the concatenation and
  * its successor dropped via lag(take) — all partitioned by word, no
  * per-row recursion, no UDF. The DuckDB oracle is the same K unrolled
  * layers generated from the same constants ([[mergeOracleSql]]), so the
  * two engines cannot drift independently; it was additionally validated
  * against an independent sequential reference implementation.
  *
  * Scale posture (100 TB corpus): everything is bounded by the VOCABULARY,
  * not the corpus — the one full-corpus pass is the word-frequency
  * aggregation (map-side combinable groupBy); the iterated state is
  * Σ|word| rows over distinct pieces (~10⁷ at web scale, a few GB), window
  * partitions are single words (bounded length — no skew), the pair-count
  * shuffle is vocabulary-sized, and the driver holds only the K argmax
  * rows (K bounded 1-row collects). Each round re-materializes via
  * localCheckpoint so the K-deep window chain never accumulates into one
  * plan.
  */
object BpeTrainer {

  /** Merge steps to learn. */
  val K = 8

  /** The learned merge table: (step, lhs, rhs, pair_count). */
  def trainMerges(spark: SparkSession, dir: String): DataFrame =
    trained(spark, dir)._1.orderBy("step")

  /** Per-document re-tokenization under the LEARNED vocab: word count
    * and post-merge piece count per doc. The vocab-piece relation is
    * vocabulary-sized (broadcast-class at any corpus scale); the one
    * corpus-sized pass is the word explode feeding the join. */
  def encodeCounts(spark: SparkSession, dir: String): DataFrame = {
    val wc = trained(spark, dir)._2
      .groupBy("word").agg(count(lit(1)).as("np"))
    val dw = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpePattern), lit(0))).as("word"))
    dw.join(broadcast(wc), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
      .orderBy("doc_id")
  }

  /** (merge table, final symbol corpus), built once per (JVM, dir). */
  private def trained(spark: SparkSession,
                      dir: String): (DataFrame, DataFrame) =
    graft.Memo.get(spark, "bpe-merges", (dir, K)) {
      val docs = Tables.load(spark, dir, "documents")
      val wf = docs
        .select(explode(regexp_extract_all(col("text"),
          lit(TextAnalysis.BpePattern), lit(0))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      var corpus = wf
        .select(col("word"), col("freq"),
          explode(sequence(lit(1), length(col("word")))).as("pos"))
        .withColumn("sym", expr("substring(word, pos, 1)"))
        .localCheckpoint(true)
      val w = Window.partitionBy("word").orderBy("pos")
      val merges = (1 to K).map { step =>
        val px = corpus.withColumn("nxt", lead("sym", 1).over(w))
        // Bounded 1-row collect: the argmax pair of this round.
        val top = px.filter(col("nxt").isNotNull)
          .groupBy("sym", "nxt").agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), asc("sym"), asc("nxt"))
          .head()
        val (a, b, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        val ct = px
          .withColumn("cand", col("sym") === lit(a) && col("nxt") === lit(b))
          .withColumn("grp", when(col("cand"), col("pos") -
            row_number().over(
              Window.partitionBy(col("word"), col("cand")).orderBy("pos"))))
          .withColumn("take", col("cand") && (row_number().over(
            Window.partitionBy(col("word"), col("grp")).orderBy("pos"))
            % 2 === 1))
        corpus = ct
          .withColumn("merged",
            when(col("take"), concat(col("sym"), col("nxt")))
              .otherwise(col("sym")))
          .withColumn("prev_take",
            coalesce(lag("take", 1).over(w), lit(false)))
          .filter(!col("prev_take"))
          .select(col("word"), col("freq"),
            row_number().over(w).as("pos"), col("merged").as("sym"))
          .localCheckpoint(true)
        (step, a, b, cnt)
      }
      import spark.implicits._
      (merges.toDF("step", "lhs", "rhs", "pair_count"), corpus)
    }

  /** DuckDB twin: the same K rounds unrolled, generated from the same
    * pattern/K constants. Window semantics (run grouping, odd-index take,
    * lag-drop) mirror [[trainMerges]] clause for clause. */
  def mergeOracleSql: String = {
    val union = (1 to K).map(i =>
      s"SELECT $i AS step, a AS lhs, b AS rhs, cnt AS pair_count FROM m$i")
      .mkString(" UNION ALL ")
    "WITH " + oracleCtes + s"\nSELECT * FROM ($union) ORDER BY step"
  }

  /** DuckDB twin of [[encodeCounts]]: the final unrolled corpus joined
    * back to each document's word stream. */
  def encodeOracleSql: String = {
    val p = TextAnalysis.BpePattern.replace("'", "''")
    "WITH " + oracleCtes +
      s"""
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(np) AS BIGINT) AS n_pieces
         |FROM (SELECT doc_id, unnest(regexp_extract_all(text, '$p')) AS word
         |      FROM documents) dw
         |JOIN (SELECT word, count(*) AS np FROM corpus$K GROUP BY word) wc
         |  USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def oracleCtes: String = {
    val p = TextAnalysis.BpePattern.replace("'", "''")
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""wf AS MATERIALIZED (
         |  SELECT word, count(*) AS freq FROM (
         |    SELECT unnest(regexp_extract_all(text, '$p')) AS word
         |    FROM documents)
         |  GROUP BY word)""".stripMargin,
      """corpus0 AS MATERIALIZED (
        |  SELECT word, freq, i AS pos,
        |    substr(word, CAST(i AS INTEGER), 1) AS sym
        |  FROM wf, unnest(generate_series(1, length(word))) AS t(i))"""
        .stripMargin)
    (1 to K).foreach { i =>
      ctes += s"""px$i AS MATERIALIZED (
        |  SELECT word, freq, pos, sym,
        |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        |  FROM corpus${i - 1})""".stripMargin
      ctes += s"""m$i AS MATERIALIZED (
        |  SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM px$i WHERE nxt IS NOT NULL
        |  GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      ctes += s"""ct$i AS (
        |  SELECT *, cand AND (row_number()
        |      OVER (PARTITION BY word, grp ORDER BY pos) % 2 = 1) AS take
        |  FROM (SELECT *, CASE WHEN cand THEN pos - row_number()
        |          OVER (PARTITION BY word, cand ORDER BY pos) END AS grp
        |        FROM (SELECT p.*, (p.sym = m.a AND p.nxt = m.b) AS cand
        |              FROM px$i p, m$i m)))""".stripMargin
      ctes += s"""corpus$i AS MATERIALIZED (
        |  SELECT word, freq,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
        |  FROM (
        |    SELECT word, freq, pos,
        |      CASE WHEN take THEN sym || nxt ELSE sym END AS sym,
        |      coalesce(lag(take) OVER (PARTITION BY word ORDER BY pos),
        |        false) AS prev_take
        |    FROM ct$i)
        |  WHERE NOT prev_take)""".stripMargin
    }
    ctes.mkString(",\n")
  }
}

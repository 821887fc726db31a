package graft

import graft.text.{BpeTrainer, TextAnalysis}

/** The distributed BPE trainer vs an independent SEQUENTIAL reference:
  * the window-arithmetic greedy apply (run grouping + odd-index take)
  * must reproduce the textbook left-to-right merge loop exactly —
  * including the only genuinely order-sensitive case, runs of identical
  * symbols (a == b chains), which the synthetic fixture forces. */
class BpeSpec extends SparkTestBase {

  /** Textbook BPE on a word-frequency table: sequential greedy apply,
    * argmax by (count desc, lhs, rhs). Deliberately shares NO code with
    * BpeTrainer. */
  private def refMerges(wf: Map[String, Long],
                        k: Int): Seq[(Int, String, String, Long)] = {
    var corpus: Map[String, Vector[String]] =
      wf.map { case (w, _) => w -> w.map(_.toString).toVector }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case Vector(x, y) =>
            counts((x, y)) = counts.getOrElse((x, y), 0L) + wf(w)
          case _ =>
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        corpus = corpus.map { case (w, syms) =>
          val o = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              o += (a + b); i += 2
            } else { o += syms(i); i += 1 }
          }
          w -> o.result()
        }
        out += ((step, a, b, cnt))
        step += 1
      }
    }
    out.result()
  }

  /** Word-frequency table exactly as the trainer derives it. */
  private def wordFreq(dir: String): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, dir, "documents")
      .select(explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpePattern), lit(0))).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("distributed merges equal the sequential reference on real docs") {
    val dir = "/root/testdata/sf0.001"
    val got = BpeTrainer.trainMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got.length == BpeTrainer.K)
    assert(got == refMerges(wordFreq(dir), BpeTrainer.K))
    assert(got.forall(_._4 > 0))
  }

  test("encode under the learned vocab compresses and conserves words") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val enc = BpeTrainer.encodeCounts(spark, dir)
    val agg = enc.agg(sum("n_words"), sum("n_pieces")).head()
    val (words, pieces) = (agg.getLong(0), agg.getLong(1))
    // Every merge strictly shrinks some words: chars > pieces >= words.
    val chars = Tables.load(spark, dir, "documents")
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.text.TextAnalysis.BpePattern), lit(0))).as("w"))
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(words > 0 && pieces >= words && chars > pieces,
      s"words=$words pieces=$pieces chars=$chars")
    // Per-doc word counts must equal the raw pre-tokenizer's counts
    // (encoding re-segments within words, never drops one).
    val direct = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(regexp_extract_all(col("text"),
        lit(graft.text.TextAnalysis.BpePattern), lit(0))).as("w"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val joined = enc.join(direct, "doc_id")
      .filter(col("n_words") =!= col("n"))
    assert(joined.isEmpty)
  }

  test("batched rounds equal sequential greedy where merges INTERACT") {
    // Every batch guard has a forcing pattern here:
    //  - 'ababab…' repeats make the merged symbol's self-pair (ab,ab)
    //    outrank later original candidates → new-pair dominance stop;
    //  - (t,h)/(h,e) and (e,s)/(s,t) share consumed symbols → the
    //    interaction prefix-stop;
    //  - re-merging through multi-char symbols ((ab,ab) etc.) exercises
    //    output-collision bookkeeping across rounds.
    // A batcher without the guards returns a DIFFERENT table on this
    // corpus (the top-M original pairs are not sequential greedy's
    // choices); equality against the independent reference is the proof.
    import spark.implicits._
    val tmp = Scratch.dir("graft-bpespec", "interact")
    Seq(
      (1L, "abababababab abababab ababab"),
      (2L, "the these thesis esthete"),
      (3L, "street tests attest tsetse"),
      (4L, "bcbcbc bcb cbc"),
      (5L, "aaaa aab ba ab")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val k = 24
    val got = BpeTrainer
      .trainedK(spark, Tables.load(spark, tmp, "documents"),
        ("bpespec-interact", tmp), k)
      ._1.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val ref = refMerges(wordFreq(tmp), k)
    assert(got == ref, s"\nbatched: $got\nsequential: $ref")
    assert(got.length == k, "fixture must not exhaust before k merges")
  }

  test("deep vocabulary (K=256) equals sequential greedy on real docs") {
    val dir = "/root/testdata/sf0.001"
    val got = BpeTrainer.trainMergesDeep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val ref = refMerges(wordFreq(dir), BpeTrainer.DeepK)
    assert(got.length == ref.length)
    // first divergence (if any) reported precisely
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      assert(g == r, s"first divergence at step ${i + 1}: batched $g vs sequential $r")
    }
  }

  test("tokenize emits each doc's exact ordered pieces: chars conserved, counts agree") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val tok = BpeTrainer.tokenizeDocs(spark, dir)
    // 1. Character conservation: pieces joined (separator stripped) ==
    //    the doc's pre-tokenizer words concatenated in order — merging
    //    re-segments, never rewrites.
    val direct = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        concat_ws("", regexp_extract_all(col("text"),
          lit(graft.text.TextAnalysis.BpePattern), lit(0))).as("joined"))
    val bad = tok.join(direct, "doc_id")
      .filter(regexp_replace(col("pieces_str"), "\u001f", "") =!= col("joined"))
    assert(bad.isEmpty)
    // 2. n_pieces equals encodeCounts' n_pieces row-for-row, and equals
    //    the separator count + 1 (one string, two independent counters).
    val enc = BpeTrainer.encodeCounts(spark, dir)
      .select(col("doc_id"), col("n_pieces").as("np_enc"))
    val mismatch = tok.join(enc, "doc_id")
      .filter(col("n_pieces") =!= col("np_enc") ||
        col("n_pieces") =!= size(split(col("pieces_str"), "\u001f")))
    assert(mismatch.isEmpty)
    assert(tok.count() > 0)
  }

  test("released artifact round-trips: load merges, tokenize == trained-state deep tokenizer") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val path = BpeTrainer.releasedTokenizer(spark, dir)
    // The artifact is re-loadable plain parquet: the merge table read
    // back IS the learned table, and the vocab ids are unique and cover
    // every merge output.
    val merges = spark.read.parquet(s"$path/merges").orderBy("step")
    assert(merges.collect().toSeq ==
      BpeTrainer.trainMergesDeep(spark, dir).collect().toSeq)
    val vocab = spark.read.parquet(s"$path/vocab")
    val nVocab = vocab.count()
    assert(vocab.select("piece_id").distinct().count() == nVocab)
    assert(vocab.select("piece").distinct().count() == nVocab)
    val outputs = merges.select(
      concat(col("lhs"), col("rhs")).as("piece")).distinct()
    assert(outputs.join(vocab, "piece", "left_anti").isEmpty,
      "a merge output is missing from the released vocab")
    // THE round-trip: tokenization driven ONLY by the artifact (pure
    // merge replay from characters — no trainer, no corpus state)
    // equals the trained-state deep tokenizer document-for-document.
    val fromArtifact = BpeTrainer
      .tokenizeDocsFromArtifact(spark, dir, path).collect().toSeq
    val fromState = BpeTrainer.tokenizeDocsDeep(spark, dir).collect().toSeq
    assert(fromArtifact.nonEmpty && fromArtifact == fromState)
  }

  test("identical-symbol chains merge with greedy left-to-right parity") {
    // 'aaaa'/'aaaaa' force (a,a) chains where a naive "merge every
    // candidate" would differ from greedy (aaaaa → [aa][aa][a], never
    // [aa][aaa] or an overlapped merge), and repeated merges promote to
    // multi-char symbols ('aa','aa').
    import spark.implicits._
    val tmp = Scratch.dir("graft-bpespec", "chain")
    Seq(
      (1L, "aaaa aaaaa ab ab ab"),
      (2L, "aaaa aaaa baa baa"),
      (3L, "ab aab aaab aaaab")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = BpeTrainer.trainMerges(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == refMerges(wordFreq(tmp), BpeTrainer.K))
  }
}

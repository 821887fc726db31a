package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame

/** Hand-computable fixtures for the curation-signal text operators
  * (repetition, PII, commonness, length histogram). The registry rows
  * run the same code over `documents` against DuckDB twins; these
  * specs pin the SEMANTICS on inputs where the answer is obvious —
  * including the nonzero-PII behavior the synthetic testdata (zero
  * emails/phones/IPs) cannot exercise. */
class TextSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Int, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text"))

  test("repetition fractions count exact token/ngram multiplicities") {
    val out = TextAnalysis.repetitionOf(docs(
      1 -> "a a a b",       // top token 3/4; bigrams {a a, a a, a b} top 2/3
      2 -> "x y x y x y",   // trigrams {x y x, y x y, x y x, y x y}: all dup
      3 -> "q"              // no bigrams/trigrams → nulls, not fake zeros
    )).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getDouble(2) === 3.0 / 4)
    assert(out(1).getDouble(3) === 2.0 / 3)
    assert(out(1).getDouble(4) === 0.0) // trigrams a-a-a, a-a-b unique
    assert(out(2).getDouble(4) === 1.0) // every trigram position repeats
    assert(out(2).getDouble(3) === 3.0 / 5) // "x y" 3 of 5 bigrams
    assert(out(3).getDouble(2) === 1.0)
    assert(out(3).isNullAt(3) && out(3).isNullAt(4))
  }

  test("pii counts find emails, phone shapes, dotted quads; clean text is clean") {
    val out = TextAnalysis.piiCountsOf(docs(
      1 -> "contact bob@example.com or carol@test.org now",
      2 -> "call 555-123-4567 from 10.0.0.1 please",
      3 -> "perfectly clean prose with no identifiers"
    )).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) === 2 && out(1).getBoolean(4))
    assert(out(2).getLong(2) === 1 && out(2).getLong(3) === 1
      && out(2).getBoolean(4))
    assert(out(3).getLong(1) === 0 && out(3).getLong(2) === 0
      && out(3).getLong(3) === 0 && !out(3).getBoolean(4))
  }

  test("pii redaction rewrites every class and is identity on clean text") {
    val fixture = docs(
      1 -> "contact bob@example.com or carol@test.org now",
      2 -> "call 555-123-4567 from 10.0.0.1 please",
      3 -> "perfectly clean prose with no identifiers")
    val out = TextAnalysis.piiRedactOf(fixture).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(1).getBoolean(3) && out(2).getBoolean(3))
    assert(!out(3).getBoolean(3))
    // The fingerprint equals md5 of the expected rewritten strings.
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getString(1) ==
      fp("contact [EMAIL] or [EMAIL] now"))
    assert(out(2).getString(1) == fp("call [PHONE] from [IP] please"))
    assert(out(2).getLong(2) == "call [PHONE] from [IP] please".length)
    assert(out(3).getString(1) ==
      fp("perfectly clean prose with no identifiers"))
  }

  test("quality percentiles: rank-monotone in quality, exact endpoints") {
    val rows = TextAnalysis
      .qualityPercentiles(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 500)
    assert(rows.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 })
    // percent_rank over the (quality, doc_id) total order: sorting by
    // that key must produce 0, 1/(n-1), 2/(n-1), ... exactly.
    val sorted = rows.sortBy { case (id, q, _) => (q, id) }
    sorted.zipWithIndex.foreach { case ((id, _, p), i) =>
      assert(p == i.toDouble / (rows.length - 1), s"doc $id")
    }
  }

  test("commonness is the mean document-frequency over distinct tokens") {
    // df: shared=3, rare=1, mid=2 → doc 1 mean (3+1)/2, doc 3 mean 3/1.
    val out = TextAnalysis.commonnessOf(docs(
      1 -> "shared rare",
      2 -> "shared mid",
      3 -> "shared shared", // repeats collapse: one distinct token
      4 -> "mid"
    )).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) === 2 && out(1).getLong(2) === 4
      && out(1).getDouble(3) === 2.0)
    assert(out(3).getLong(1) === 1 && out(3).getDouble(3) === 3.0)
    assert(out(4).getDouble(3) === 2.0)
  }

  test("vocab coverage ranks terms and accumulates exact coverage") {
    // counts: b=4, a=3, c=1 of 8 total
    val out = TextAnalysis.vocabCoverageOf(docs(
      1 -> "a b b", 2 -> "b a c a b"), k = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq((1L, "b", 4L, 4L), (2L, "a", 3L, 7L)))
    assert(out(1).getDouble(4) === 7.0 / 8)
  }

  test("contamination flags docs sharing a benchmark 8-token window") {
    val phrase = "w1 w2 w3 w4 w5 w6 w7 w8"
    val out = TextAnalysis.contaminationOf(docs(
      0 -> s"$phrase tail tail",            // benchmark doc: flags itself
      1 -> s"lead in words then $phrase",   // contains the phrase → flagged
      2 -> "an entirely different document with plenty of words here"
    ), benchmarkIds = Seq(0L)).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getBoolean(2) && out(0).getLong(1) >= 1)
    assert(out(1).getBoolean(2))
    assert(!out(2).getBoolean(2) && out(2).getLong(1) === 0)
  }

  test("bigram counts: conditional probabilities per left token sum to 1") {
    // doc1: "a b a b a" → bigrams ab, ba, ab, ba; doc2: "a c" → ac.
    // n1(a)=3 (two ab + one ac), n1(b)=2. No cross-doc bigrams.
    val out = TextAnalysis.bigramTopOf(docs(1 -> "a b a b a", 2 -> "a c"), 20)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSet === Set(
      ("a", "b", 2L, 3L, 2.0 / 3), ("b", "a", 2L, 2L, 1.0),
      ("a", "c", 1L, 3L, 1.0 / 3)))
    // single-token docs contribute nothing
    assert(TextAnalysis.bigramTopOf(docs(1 -> "solo"), 20).count() === 0)
  }

  test("CMS heavy hitters: estimates never undercount and stay tight here") {
    val rows = TextAnalysis.heavyHittersCms(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS $est < exact $exact")
      // eps=0.001 over this corpus: collisions add at most ~eps·N mass.
      assert(est - exact <= math.max(10L, exact / 10))
    }
    // Deterministic across runs (fixed sketch seed).
    val again = TextAnalysis.heavyHittersCms(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("bm25: zero-hit is exactly 0, tf saturates, rarer term outweighs") {
    val out = TextAnalysis.bm25SearchOf(docs(
      1 -> "spark spark spark spark spark", // tf=5 of a df=2 term
      2 -> "spark a a a a",                 // tf=1 of the same term
      3 -> "a a a a a",                     // no query terms
      4 -> "rare a a a a"                   // tf=1 of a df=1 term
    ), terms = Seq("spark", "rare"), k = 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(3) === 0.0)               // no hits → exact zero mass
    assert(out(1) > out(2))              // more tf, same dl → higher
    assert(out(1) < 5 * out(2))          // …but saturated, not linear
    assert(out(4) > out(2))              // rarer term, same tf/dl → higher
  }

  test("chunking: stride windows cover the tail, short docs stay whole") {
    val out = TextAnalysis.chunkTokensOf(docs(
      1 -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens
      2 -> "a b c"                                   // shorter than a chunk
    ), chunkSize = 4, overlap = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r).toMap
    // size 4, stride 2 over 10 tokens: windows at 1,3,5,7 — the last
    // one ends exactly at the tail.
    assert(out.keys.count(_._1 == 1) === 4)
    assert(out((1, 0L)).getString(3) === "t1 t2 t3 t4")
    assert(out((1, 3L)).getString(3) === "t7 t8 t9 t10")
    assert(out.filterKeys(_._1 == 1).values
      .forall(_.getLong(2) === 4L))
    // a 3-token doc is one whole (clipped) chunk
    assert(out.keys.count(_._1 == 2) === 1)
    assert(out((2, 0L)).getString(3) === "a b c"
      && out((2, 0L)).getLong(2) === 3L)
  }

  test("lm likelihood: exact bigram conditionals, sorted-fold mean") {
    // corpus LM: n12 (a,b)=3 (b,a)=1 (b,c)=1; n1 a=3 b=2
    // → P(b|a)=1.0, P(a|b)=0.5, P(c|b)=0.5
    val out = TextAnalysis.lmLikelihoodOf(docs(
      1 -> "a b a b", // ps [1.0, 0.5, 1.0] → mean 2.5/3, min 0.5
      2 -> "a b c",   // ps [1.0, 0.5]      → mean 0.75,  min 0.5
      3 -> "q"        // no bigrams → absent, not a fake zero
    )).collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(1, 2))
    assert(out(1).getLong(1) === 3L)
    assert(out(1).getDouble(2) === 2.5 / 3 && out(1).getDouble(3) === 0.5)
    assert(out(2).getDouble(2) === 0.75 && out(2).getDouble(3) === 0.5)
  }

  test("boilerplate prefixes: shared headers surface, short docs skip") {
    val header = "terms of service apply to all pages"  // 7 tokens
    val out = TextAnalysis.boilerplatePrefixesOf(docs(
      1 -> s"$header here body one",
      2 -> s"$header here body two entirely different",
      3 -> s"$header here",                 // 9 tokens, same 8-prefix
      4 -> "unique document body with enough tokens to qualify fine",
      5 -> "short doc"                      // < 8 tokens → skipped
    ), w = 8, k = 10).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === s"$header here")
    assert(out(0).getLong(1) === 3L && out(0).getInt(2) === 1)
  }

  test("repeated passages: cross-doc windows surface, within-doc and " +
    "short docs do not") {
    val out = TextAnalysis.repeatedPassagesOf(docs(
      1 -> "c1 c2 c3 c4 a b",        // shared passage at offset 0
      2 -> "x y c1 c2 c3 c4",        // same passage at offset 2 (≡ mod s)
      3 -> "unrelated tokens entirely here now",
      4 -> "c1 c2 c3",               // < w tokens → skipped
      5 -> "r1 r2 r3 r4 r1 r2 r3 r4" // within-doc repeat only → gated out
    ), w = 4, s = 2, k = 10).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "c1 c2 c3 c4")
    assert(out(0).getLong(1) === 2L)   // distinct docs
    assert(out(0).getLong(2) === 2L)   // occurrences
    assert(out(0).getInt(3) === 1)     // example_doc = min
  }

  test("chunk dedup report: internally consistent against the chunker") {
    val sf = "/root/testdata/sf0.001"
    val r = TextAnalysis.chunkDedupReport(spark, sf).head()
    val (nChunks, nDistinct, nRedundant, frac, nInDup) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))
    assert(nChunks === TextAnalysis.chunkTokens(spark, sf).count())
    assert(nRedundant === nChunks - nDistinct && nRedundant >= 0)
    assert(frac === nRedundant.toDouble / nChunks)
    // members of dup groups = redundant copies + one original per group
    assert(nInDup >= nRedundant)
    assert((nInDup == 0) == (nRedundant == 0))
  }

  test("quality-LM agreement equals the brute Pearson over joined signals") {
    val sf = "/root/testdata/sf0.001"
    val x = TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val y = TextAnalysis.lmLikelihood(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ks = x.keySet intersect y.keySet
    val n = ks.size.toDouble
    val (sx, sy) = (ks.toSeq.map(x).sum, ks.toSeq.map(y).sum)
    val sxy = ks.toSeq.map(k => x(k) * y(k)).sum
    val (sxx, syy) = (ks.toSeq.map(k => x(k) * x(k)).sum,
      ks.toSeq.map(k => y(k) * y(k)).sum)
    val brute = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val row = TextAnalysis.qualitySignalCorrelation(spark, sf).head()
    assert(row.getLong(0) === ks.size.toLong)
    val r = row.getDouble(1)
    assert(r >= -1.0 && r <= 1.0)
    assert(math.abs(r - brute) < 1e-9) // fold order differs → tolerance
  }

  test("length histogram buckets by 64 chars with exact sums") {
    val a = "x" * 10   // bucket 0
    val b = "y" * 100  // bucket 1
    val c = "z" * 70   // bucket 1
    val out = TextAnalysis.lengthHistOf(docs(1 -> a, 2 -> b, 3 -> c))
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    assert(out(1).getLong(1) === 2 && out(1).getLong(2) === 70
      && out(1).getLong(3) === 100 && out(1).getLong(4) === 170)
  }

  test("gopher gates: each rule fires on its crafted violator") {
    val good = (("the of word " * 20) + "tail").trim // 61 words, 2+ stops
    val short = "the of tiny doc"                    // fails word count
    val numeric = ("1 2 3 4 5 the of " * 10).trim    // <80% alphabetic
    val noStop = ("word " * 60).trim                 // only 0-1 distinct stops
    val symbols = (("# ... the of w " * 12)).trim    // symbol ratio > 0.1
    val out = TextAnalysis.gopherFiltersOf(docs(
        1 -> good, 2 -> short, 3 -> numeric, 4 -> noStop, 5 -> symbols))
      .collect().map(r => r.getInt(0) -> r).toMap
    def flag(id: Int, name: String): Boolean = {
      val r = out(id)
      r.getBoolean(r.fieldIndex(name))
    }
    assert(flag(1, "keep"))
    assert(!flag(2, "pass_word_count") && !flag(2, "keep"))
    assert(flag(3, "pass_word_count") && !flag(3, "pass_alpha"))
    assert(!flag(4, "pass_stop"))
    assert(!flag(5, "pass_symbol") && flag(5, "pass_stop"))
  }

  test("gopher funnel: monotone attrition consistent with the flags") {
    val corpus = (1 to 30).map { i =>
      i -> (if (i % 3 == 0) "the of tiny" // fails word count
            else (("the of word w" + i + " ") * 15).trim)
    }
    val flags = TextAnalysis.gopherFiltersOf(docs(corpus: _*))
    val funnel = TextAnalysis.gopherFunnelOf(docs(corpus: _*))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(funnel("total") === 30L)
    assert(funnel("after_word_count") === 20L)
    // survivors never increase along the gate order
    val order = Seq("total", "after_word_count", "after_mean_word_len",
      "after_alpha", "after_stop", "after_symbol")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a) >= funnel(b), s"$a -> $b")
    }
    // final stage equals the conjunction count from the flags frame
    val kept = flags.filter(org.apache.spark.sql.functions.col("keep"))
      .count()
    assert(funnel("after_symbol") === kept)
  }

  test("dup-span mass: union coverage, no double count, shorts zero") {
    import spark.implicits._
    val t = (1 to 20).map(i => s"t$i")
    val docs = Seq(
      (1L, t.mkString(" ")),                 // windows ix0, ix1 both shared
      (2L, t.take(16).mkString(" ")),        // shares doc1's ix0 window
      (3L, t.drop(4).mkString(" ")),         // shares doc1's ix1 window
      (4L, (1 to 20).map(i => s"u$i").mkString(" ")), // unrelated
      (5L, "v1 v2 v3 v4 v5")                 // shorter than w
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanMassOf(docs, 16, 4).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc1: two overlapping flagged windows cover positions 0..19 —
    // the union is 20, NOT 32 (the no-double-count claim)
    assert(got(1L) == ((20L, 2L, 20L, 1.0)))
    assert(got(2L) == ((16L, 1L, 16L, 1.0)))
    assert(got(3L) == ((16L, 1L, 16L, 1.0)))
    assert(got(4L) == ((20L, 0L, 0L, 0.0)))
    assert(got(5L) == ((5L, 0L, 0L, 0.0)))
  }

  test("hybrid retrieval: RRF replay from the two standalone arms") {
    val sf = "/root/testdata/sf0.001"
    val lex = TextAnalysis.bm25Search(spark, sf, k = 20).collect()
      .map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    val vec = graft.similarity.Similarity.cosineTopK(spark, sf, 0L, 20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    val expect = (lex.keySet ++ vec.keySet).map { d =>
      val s = lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vec.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (d, s, lex.contains(d).compare(false) + vec.contains(d).compare(false))
    }.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = TextAnalysis.hybridRetrieval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got == expect && got.nonEmpty)
    // a doc in both arms must outscore the same ranks in one arm alone
    assert(got.head._3 >= 1)
  }
}

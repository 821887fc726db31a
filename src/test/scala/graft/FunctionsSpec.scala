package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.similarity.Similarity

/** The native CosineF32 expression: registration, SQL surface, and exact
  * bit-parity with the composable higher-order-function formulation. */
class FunctionsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** A session where expression-codegen failure is a TEST FAILURE, not a
    * silent interpreter fallback: factoryMode=CODEGEN_ONLY forces the
    * generated projection path and codegen.fallback=false turns a Janino
    * compile error (e.g. two expressions emitting the same fixed local
    * name into one generated function) into a thrown exception instead
    * of a de-vectorized plan. Cloned via newSession() so the shared test
    * session's conf is untouched (suites run in parallel). Round-11
    * lesson: without this, the cosine parity test itself tripped a
    * redefinition error and quietly validated the INTERPRETED path. */
  private def codegenOnlySession(): org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  test("native cosine is bit-identical to the fold formulation (CODEGEN_ONLY)") {
    val s = codegenOnlySession()
    GraftFunctions.register(s)
    val e = graft.Tables.load(s, dir, "embeddings")
    val seed = e.filter(col("vec_id") === 0L).select(col("embedding").as("se"))
    val both = e.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        GraftFunctions.cosineF32(col("embedding"), col("se")).as("native"),
        Similarity.cosineFold(col("embedding"), col("se")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("registered function is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // orthogonal vectors
    val o = spark.sql(
      "SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("native simhash64 matches the fold on randomized token soups") {
    import spark.implicits._
    // 200 generated docs in ONE job: empty docs, unicode, repeated and
    // whitespace-adjacent tokens — the shapes a corpus actually throws.
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("the", "Ünïcode", "a b", "", "x", "longtokenlongtoken",
      "123", "%$#@", "tok")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val both = df.select(
      graft.functions.GraftFunctions.simHash64(
        graft.text.TextAnalysis.tokens).as("native"),
      graft.dedup.Dedup.simhashColFold(
        graft.text.TextAnalysis.tokens).as("fold"))
    assert(both.filter(org.apache.spark.sql.functions
      .col("native") =!= org.apache.spark.sql.functions.col("fold")).isEmpty)
  }

  test("native simhash64 is identical to the fold formulation") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(col("doc_id"),
        GraftFunctions.simHash64(graft.text.TextAnalysis.tokens).as("native"),
        graft.dedup.Dedup.simhashColFold(graft.text.TextAnalysis.tokens)
          .as("fold"))
      .collect()
    assert(both.length == 500)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
  }

  test("native srp_sig is bit-identical to the 32-fold formulation (CODEGEN_ONLY)") {
    val s = codegenOnlySession()
    GraftFunctions.register(s)
    val e = graft.Tables.load(s, dir, "embeddings")
    val both = e.select(col("vec_id"),
        Similarity.srpSignature(col("embedding")).as("native"),
        Similarity.srpSignatureFold(col("embedding")).as("fold"))
      .collect()
    assert(both.length == 500)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
    // signatures actually vary (a constant signature would be vacuous)
    assert(both.map(_.getLong(1)).distinct.length > 10)
  }

  test("two cosines + two srp_sigs in ONE projection compile (CODEGEN_ONLY)") {
    // The round-11 defect: fixed local names in doGenCode made any
    // projection bearing TWO native expressions fail Janino compilation
    // ("Redefinition of local variable") and silently interpret. This
    // composes both expression kinds twice in one select — under
    // CODEGEN_ONLY + fallback=false a regression throws instead of
    // passing on the interpreted path.
    val s = codegenOnlySession()
    GraftFunctions.register(s)
    // Two blooms in the same projection too — BloomMightContain's
    // generated code must coexist with itself (addReferenceObj slots,
    // no fixed locals).
    val bloomBytes = graft.operators.Pruning.dimBloomBytes(s, dir)
    val e = graft.Tables.load(s, dir, "embeddings")
    val seed = e.filter(col("vec_id") === 0L).select(col("embedding").as("se"))
    val rows = e.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        GraftFunctions.cosineF32(col("embedding"), col("se")).as("c1"),
        GraftFunctions.cosineF32(col("se"), col("embedding")).as("c2"),
        Similarity.srpSignature(col("embedding")).as("g1"),
        Similarity.srpSignature(col("se")).as("g2"),
        GraftFunctions.bloomMightContain(bloomBytes, col("vec_id")).as("b1"),
        GraftFunctions.bloomMightContain(bloomBytes,
          col("vec_id") + lit(1L)).as("b2"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      // cosine is symmetric — the two emissions must agree bit-for-bit
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    val seedSig = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == seedSig)) // g2 is constant per row
  }

  test("null inputs propagate null (BinaryExpression null-safety)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_f32(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .head()
    assert(r.isNullAt(0))
  }
}

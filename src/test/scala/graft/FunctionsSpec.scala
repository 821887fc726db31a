package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.similarity.Similarity

/** The native CosineF32 expression: registration, SQL surface, and exact
  * bit-parity with the composable higher-order-function formulation. */
class FunctionsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("native cosine is bit-identical to the fold formulation") {
    GraftFunctions.register(spark)
    val e = graft.Tables.load(spark, dir, "embeddings")
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

  test("native srp_sig is bit-identical to the 32-fold formulation") {
    GraftFunctions.register(spark)
    val e = graft.Tables.load(spark, dir, "embeddings")
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

  test("null inputs propagate null (BinaryExpression null-safety)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_f32(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .head()
    assert(r.isNullAt(0))
  }
}

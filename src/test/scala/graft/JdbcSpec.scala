package graft

import graft.sources.Jdbc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class JdbcSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private val schema = StructType.fromDDL(
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "total_cents BIGINT")

  test("partitioned JDBC read: numPartitions concurrent range cursors") {
    val url = Jdbc.seedOrders(spark, dir)
    val df = Jdbc.loadJdbc(spark, url, "orders", "o_orderkey", 1L, 100000L,
      8, schema)
    assert(df.rdd.getNumPartitions == 8)
    // Range partitions cover everything exactly once.
    val viaJdbc = df.count()
    val viaParquet = Tables.load(spark, dir, "orders").count()
    assert(viaJdbc == viaParquet && viaJdbc > 0)
  }

  test("JDBC read round-trips rows exactly (integer cents)") {
    val url = Jdbc.seedOrders(spark, dir)
    val live = Jdbc.loadJdbc(spark, url, "orders", "o_orderkey", 1L,
      100000L, 4, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val orig = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.operators.Relational.cents(col("o_totalprice")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(live == orig && orig.nonEmpty)
  }

  test("filters push through JDBC into the remote WHERE clause") {
    val df = Jdbc.ordersJdbcLookup(spark, dir, orderKey = 1L)
    val scan = df.queryExecution.executedPlan.toString
    // JDBCRelation advertises pushed predicates as PushedFilters; an
    // unpushed equality would ship the whole table through one executor.
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("\\s", "").contains("o_orderkey"),
      s"o_orderkey filter not pushed to JDBC source:\n$scan")
    assert(df.count() == 1)
  }

  test("unreachable RDBMS recovers to an empty typed frame (S2 posture)") {
    val df = Jdbc.loadJdbc(spark,
      "jdbc:derby:/tmp/graft-derby-nonexistent-db", "orders",
      "o_orderkey", 1L, 100L, 4, schema)
    assert(df.isEmpty && df.schema == schema)
    // Missing table on a live DB: same degradation.
    val url = Jdbc.seedOrders(spark, dir)
    val missing = Jdbc.loadJdbc(spark, url, "no_such_table", "o_orderkey",
      1L, 100L, 4, schema)
    assert(missing.isEmpty && missing.schema == schema)
  }
  test("JDBC drift posture: null-fill missing, widen INT->BIGINT, reject VARCHAR->BIGINT") {
    import org.apache.spark.sql.types._
    val url = Jdbc.derbyUrlFor("/tmp/graft-jdbc-drift-spec")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE drifted") catch { case _: Exception => () }
      // upstream catalog: k INT (narrower than declared BIGINT), plus an
      // extra column the contract does not know; `name` was dropped
      // upstream (missing), `v` stayed conforming.
      st.execute("CREATE TABLE drifted (k INT, v DOUBLE, extra VARCHAR(8))")
      st.execute("INSERT INTO drifted VALUES (7, 1.5, 'x'), (8, 2.5, 'y')")
      val declared = StructType(Seq(StructField("k", LongType),
        StructField("name", StringType), StructField("v", DoubleType)))
      val got = Jdbc.loadJdbcDeclared(spark, url, "drifted", "k", 0L, 100L,
        2, declared).orderBy("k").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(7L, 8L))   // widened exact
      assert(got.forall(_.isNullAt(1)))                    // null-filled
      assert(got.map(_.getDouble(2)).toSeq == Seq(1.5, 2.5))
      assert(got.head.length == 3)                         // extra dropped
      // incompatible: VARCHAR upstream where BIGINT declared
      val bad = StructType(Seq(StructField("k", LongType),
        StructField("extra", LongType), StructField("v", DoubleType)))
      val e = intercept[Jdbc.SchemaDriftException] {
        Jdbc.loadJdbcDeclared(spark, url, "drifted", "k", 0L, 100L, 2, bad)
      }
      assert(e.getMessage.contains("extra") &&
        e.getMessage.contains("cannot widen"))
    } finally conn.close()
  }
}

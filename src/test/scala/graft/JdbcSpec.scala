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
}

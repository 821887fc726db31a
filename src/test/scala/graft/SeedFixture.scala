package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's seed micro-fixture (reference
  * `postgres/init/02_seed.sql:1-26`, mapped per FIXTURES.md §2) written as
  * parquet in the testdata layout, so every `(spark, dir) => DataFrame`
  * operator runs on it unchanged. Entity mapping: C1..C3 → custkey 1..3,
  * P1..P4 → partkey 1..4, O1..O3 → orderkey 1..3, CAT1/CAT2 → p_brand.
  *
  * `dirX2` holds every table twice (concatenated input) for the MERGE
  * idempotency property (SURVEY §5.3).
  */
object SeedFixture {

  case class Customer(c_custkey: Long, c_name: String, c_mktsegment: String,
                      c_join_date: java.sql.Date)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
                  p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderpriority: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_linenumber: Int,
                      l_quantity: Double)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** join_date per 02_seed.sql:2-5 — the one Customer property the
    * testdata tables can't carry (no stand-in column; FIXTURES.md §1). */
  def customers: Seq[Customer] = Seq(
    Customer(1, "Alice", "SEG", java.sql.Date.valueOf("2024-01-02")),
    Customer(2, "Bob", "SEG", java.sql.Date.valueOf("2024-02-11")),
    Customer(3, "Chloé", "SEG", java.sql.Date.valueOf("2024-03-05")))

  def parts: Seq[Part] = Seq(
    Part(1, "Wireless Mouse", "CAT1", 29.99),
    Part(2, "USB-C Hub", "CAT1", 49.00),
    Part(3, "Graph Databases Book", "CAT2", 39.00),
    Part(4, "Mechanical Keyboard", "CAT1", 89.00))

  def orders: Seq[Order] = Seq(
    Order(1, 1, "1-URGENT", 78.99, ts("2024-04-01 10:15:00")),
    Order(2, 2, "2-HIGH", 39.00, ts("2024-04-02 12:30:00")),
    Order(3, 1, "3-MEDIUM", 138.00, ts("2024-04-05 08:05:00")))

  def lineitems: Seq[Lineitem] = Seq(
    Lineitem(1, 1, 1, 1), Lineitem(1, 2, 2, 1), Lineitem(2, 3, 1, 1),
    Lineitem(3, 4, 1, 1), Lineitem(3, 2, 2, 1))

  /** E1..E5 (02_seed.sql:21-26); target product in props.k, per the
    * testdata events shape. */
  def events: Seq[Event] = Seq(
    Event(1, ts("2024-05-01 10:00:00"), 1, "view", 1.0, """{"k": 3}"""),
    Event(2, ts("2024-05-01 10:01:00"), 1, "click", 1.0, """{"k": 3}"""),
    Event(3, ts("2024-05-02 11:00:00"), 3, "view", 1.0, """{"k": 1}"""),
    Event(4, ts("2024-05-03 12:00:00"), 2, "view", 1.0, """{"k": 2}"""),
    Event(5, ts("2024-05-04 13:00:00"), 2, "add_to_cart", 1.0, """{"k": 4}"""))

  /** The fixture schema as a DDL script — replayed through the S4
    * runner ([[graft.sources.Ddl]]) so the fixture exercises the same
    * schema-script path the reference's `run_cypher_file` replays
    * (reference `app/etl.py:80-88`, `postgres/init/01_schema.sql`). */
  val FixtureDdl: String =
    """CREATE TABLE customer (
      |  c_custkey BIGINT PRIMARY KEY,
      |  c_name TEXT NOT NULL,
      |  c_mktsegment TEXT,
      |  c_join_date DATE NOT NULL
      |);
      |-- p_brand carries the reference's category (FIXTURES.md §2)
      |CREATE TABLE part (
      |  p_partkey BIGINT PRIMARY KEY,
      |  p_name TEXT NOT NULL,
      |  p_brand TEXT,
      |  p_retailprice DOUBLE NOT NULL
      |);
      |CREATE TABLE orders (
      |  o_orderkey BIGINT PRIMARY KEY,
      |  o_custkey BIGINT REFERENCES customer(c_custkey),
      |  o_orderpriority TEXT,
      |  o_totalprice DOUBLE NOT NULL,
      |  o_orderdate TIMESTAMPTZ NOT NULL
      |);
      |CREATE TABLE lineitem (
      |  l_orderkey BIGINT REFERENCES orders(o_orderkey),
      |  l_partkey BIGINT REFERENCES part(p_partkey),
      |  l_linenumber INT NOT NULL,
      |  l_quantity DOUBLE NOT NULL,
      |  PRIMARY KEY (l_orderkey, l_partkey)
      |);
      |CREATE TABLE events (
      |  event_id BIGINT PRIMARY KEY,
      |  ts TIMESTAMPTZ NOT NULL,
      |  user_id BIGINT REFERENCES customer(c_custkey),
      |  event_type TEXT CHECK (event_type IN ('view','click','add_to_cart','purchase')),
      |  value DOUBLE,
      |  props TEXT
      |);""".stripMargin

  private def write(spark: SparkSession, path: String, times: Int): String = {
    import org.apache.spark.sql.Row
    val schemas = graft.sources.Ddl.schemas(FixtureDdl)
    def dump(name: String, rows: Seq[Row]): Unit = {
      val df = graft.sources.Ddl.seeded(spark, schemas(name), rows)
      (1 to times).map(_ => df).reduce(_ union _)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/$name.parquet")
    }
    dump("customer", customers.map(c =>
      Row(c.c_custkey, c.c_name, c.c_mktsegment, c.c_join_date)))
    dump("part", parts.map(p =>
      Row(p.p_partkey, p.p_name, p.p_brand, p.p_retailprice)))
    dump("orders", orders.map(o => Row(o.o_orderkey, o.o_custkey,
      o.o_orderpriority, o.o_totalprice, o.o_orderdate)))
    dump("lineitem", lineitems.map(l =>
      Row(l.l_orderkey, l.l_partkey, l.l_linenumber, l.l_quantity)))
    dump("events", events.map(e =>
      Row(e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props)))
    path
  }

  /** Fixture dir, built once per JVM. */
  lazy val dir: String = write(TestSpark.spark,
    Files.createTempDirectory("graft-seed").toString, times = 1)

  /** Same rows, every table duplicated (idempotency input). */
  lazy val dirX2: String = write(TestSpark.spark,
    Files.createTempDirectory("graft-seed-x2").toString, times = 2)
}

package graft

import org.apache.spark.sql.types._
import graft.sources.Ddl

/** S4 — the DDL-script runner round-trips the reference's actual schema
  * script (reference `postgres/init/01_schema.sql` replayed by
  * `app/etl.py:80-88` `run_cypher_file`), and the seed fixture's frames
  * are built through the same path. */
class DdlSpec extends SparkTestBase {

  private val refSchema = "/root/reference/postgres/init/01_schema.sql"

  private def refScript: Option[String] = {
    val p = java.nio.file.Paths.get(refSchema)
    if (java.nio.file.Files.isReadable(p))
      Some(java.nio.file.Files.readString(p))
    else None
  }

  test("statement split matches run_cypher_file's `;`-split semantics") {
    // etl.py:84-85: split on ';', strip, drop empties — trailing
    // semicolons and blank segments yield nothing.
    val stmts = Ddl.statements(
      "CREATE TABLE a (x INT);\n\n -- a comment; with a semicolon\n" +
        "CREATE TABLE b (y TEXT) ;;  \n")
    assert(stmts == Seq("CREATE TABLE a (x INT)", "CREATE TABLE b (y TEXT)"))
  }

  test("reference 01_schema.sql round-trips: all six tables, exact types") {
    val script = refScript.getOrElse(cancel(s"$refSchema not present"))
    assert(Ddl.statements(script).length == 6)
    val s = Ddl.schemas(script)
    assert(s.keySet == Set("customers", "categories", "products", "orders",
      "order_items", "events"))
    assert(s("customers") == StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("join_date", DateType, nullable = false))))
    // NUMERIC without precision → the engine default decimal; the FK
    // REFERENCES clause parses as noise, not a constraint field.
    assert(s("products") == StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("price", DecimalType.SYSTEM_DEFAULT, nullable = false),
      StructField("category_id", StringType, nullable = true))))
    // TIMESTAMPTZ → instant timestamp (session-UTC engine convention).
    assert(s("orders")("ts") ==
      StructField("ts", TimestampType, nullable = false))
    // order_items: table-level composite PRIMARY KEY line is skipped;
    // INT → IntegerType.
    assert(s("order_items") == StructType(Seq(
      StructField("order_id", StringType, nullable = true),
      StructField("product_id", StringType, nullable = true),
      StructField("quantity", IntegerType, nullable = false))))
    // events: the inline CHECK (… IN ('view','click','add_to_cart'))
    // keeps its commas inside the paren group — the column still parses.
    assert(s("events")("event_type") ==
      StructField("event_type", StringType, nullable = true))
  }

  test("executing the reference script leaves typed empty relations") {
    val script = refScript.getOrElse(cancel(s"$refSchema not present"))
    val tables = Ddl.emptyTables(spark, script)
    assert(tables.size == 6)
    for ((name, df) <- tables) {
      assert(df.count() == 0, name)
      assert(df.schema == Ddl.schemas(script)(name), name)
    }
  }

  test("seed fixture frames are built from the DDL schema and read back") {
    val schemas = Ddl.schemas(SeedFixture.FixtureDdl)
    assert(schemas.keySet ==
      Set("customer", "part", "orders", "lineitem", "events"))
    // The parsed DDL agrees with the case-class shape the streaming
    // fixtures encode — same names, same types, column for column.
    import spark.implicits._
    val ccSchema = SeedFixture.customers.toDF().schema
    assert(schemas("customer").map(f => (f.name, f.dataType)) ==
      ccSchema.map(f => (f.name, f.dataType)))
    // And the parquet the fixture wrote came through Ddl.seeded: the
    // read-back columns match the DDL columns exactly.
    for ((t, st) <- schemas) {
      val back = spark.read.parquet(s"${SeedFixture.dir}/$t.parquet")
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        st.map(f => (f.name, f.dataType)), t)
    }
  }
}

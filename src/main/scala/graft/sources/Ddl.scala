package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S4 — the DDL-script runner (reference `app/etl.py:80-88`
  * `run_cypher_file` replaying `postgres/init/01_schema.sql`-style
  * scripts at startup). In this engine "schemas are code" (SURVEY
  * §2.1), so executing a DDL script means parsing its CREATE TABLE
  * statements into `StructType`s and materializing typed relations
  * from them — the schema travels as data into `Tables.loadSafe`,
  * `spark.createDataFrame`, and the test fixtures, not as mutable
  * engine state.
  *
  * Statement splitting mirrors `run_cypher_file` exactly: naive `;`
  * split, strip, drop empties (`etl.py:84-85`) — with `--` comments
  * removed first (psql strips them before the server sees the script;
  * a naive splitter must do the same or a commented-out statement
  * splits wrong). Type coverage is the reference dialect plus the
  * obvious widenings; column constraints `PRIMARY KEY`/`NOT NULL`
  * make a field non-nullable, `REFERENCES`/`CHECK` are validation
  * concerns the relational operators own (GraphBuilder endpoint
  * validation, fk_integrity) and parse as noise here, and table-level
  * constraint lines are skipped.
  */
object Ddl {

  /** `run_cypher_file`'s statement semantics (`etl.py:84-85`). */
  def statements(script: String): Seq[String] = {
    val noComments = script.linesIterator.map { l =>
      val i = l.indexOf("--")
      if (i < 0) l else l.substring(0, i)
    }.mkString("\n")
    noComments.split(";").map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val CreateRe =
    "(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?\"?([\\w.]+)\"?\\s*\\((.*)\\)\\s*$".r
  private val TypeRe = "(?i)^(\\w+)(?:\\s*\\((\\d+)(?:\\s*,\\s*(\\d+))?\\))?".r
  private val TableConstraints =
    Set("PRIMARY", "FOREIGN", "CHECK", "CONSTRAINT", "UNIQUE")

  private def dataType(name: String, p: Option[Int], s: Option[Int]): DataType =
    name.toUpperCase match {
      case "TEXT" | "VARCHAR" | "CHAR"      => StringType
      case "DATE"                           => DateType
      case "TIMESTAMPTZ" | "TIMESTAMP"      => TimestampType
      case "BIGINT"                         => LongType
      case "INT" | "INTEGER" | "SERIAL"     => IntegerType
      case "SMALLINT"                       => ShortType
      case "DOUBLE" | "FLOAT8" | "REAL"     => DoubleType
      case "BOOLEAN" | "BOOL"               => BooleanType
      case "BYTEA" | "BINARY"               => BinaryType
      case "NUMERIC" | "DECIMAL" =>
        (p, s) match {
          case (Some(pp), ss) => DecimalType(pp, ss.getOrElse(0))
          case _ => DecimalType.SYSTEM_DEFAULT
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported DDL type: $other")
    }

  /** Split a CREATE TABLE body on top-level commas only — commas inside
    * `NUMERIC(10,2)`, `PRIMARY KEY (a, b)` or `CHECK (x IN (...))`
    * belong to their parenthesized construct. */
  private def topLevelSplit(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Every CREATE TABLE in the script, as `table name → StructType`. */
  def schemas(script: String): Map[String, StructType] =
    statements(script).flatMap {
      case CreateRe(table, body) =>
        val fields = topLevelSplit(body).flatMap { colDef =>
          val name = colDef.takeWhile(!_.isWhitespace)
          if (TableConstraints(name.toUpperCase)) None
          else {
            val rest = colDef.drop(name.length).trim
            val m = TypeRe.findFirstMatchIn(rest).getOrElse(
              throw new IllegalArgumentException(
                s"unparseable column def in $table: $colDef"))
            val dt = dataType(m.group(1),
              Option(m.group(2)).map(_.toInt), Option(m.group(3)).map(_.toInt))
            val upper = rest.toUpperCase
            val nullable = !upper.contains("NOT NULL") &&
              !upper.contains("PRIMARY KEY")
            Some(StructField(name.stripPrefix("\"").stripSuffix("\""), dt,
              nullable))
          }
        }
        Some(table.toLowerCase -> StructType(fields))
      case _ => None // non-CREATE statements (indexes, inserts) — not S4
    }.toMap

  /** Execute the script's DDL surface: one typed EMPTY relation per
    * CREATE TABLE (the state a fresh schema replay leaves behind). */
  def emptyTables(spark: SparkSession, script: String): Map[String, DataFrame] =
    schemas(script).map { case (name, st) =>
      name -> spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], st)
    }

  /** A seeded relation over a DDL-parsed schema (the fixture path). */
  def seeded(spark: SparkSession, schema: StructType,
             rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}

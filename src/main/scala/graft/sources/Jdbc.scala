package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.util.{Failure, Success, Try}

/** Live-RDBMS (JDBC) source tier — the reference's actual ingest is six
  * plain `SELECT`s over a live Postgres connection (reference
  * `app/etl.py:27-34,141-164`) wrapped in an error-tolerant fetch
  * (`app/etl.py:132-139`). Here the same family is a *partitioned*
  * `spark.read.jdbc`: the driver issues `numPartitions` range-bounded
  * SELECTs (`WHERE $col >= lo AND $col < hi`) so 1000 executors pull
  * from the RDBMS concurrently instead of serializing one cursor through
  * the driver — the only JDBC shape that survives a 100 TB-adjacent
  * extract. Filters on the frame are pushed through to the remote WHERE
  * clause (JDBCRelation advertises them as PushedFilters — asserted in
  * JdbcSpec), so a point lookup never ships the table.
  *
  * The live engine in this zero-egress environment is embedded Apache
  * Derby (on the Spark classpath, pure JVM); the URL is the only
  * Postgres-vs-Derby difference — `loadJdbc` itself is engine-neutral.
  * Fidelity is proven end-to-end by the `source_jdbc_counts` registry
  * row: orders → JDBC table → partitioned read-back → exact-cents
  * aggregate must hash-match the DuckDB oracle computed from the parquet
  * original.
  */
object Jdbc {

  /** Derby writes its engine log relative to `derby.system.home`; pin it
    * to the JVM tmpdir once so repeated sessions never litter the CWD. */
  private lazy val derbyHome: String = {
    val home = new java.io.File(sys.props("java.io.tmpdir"), "graft-derby")
    home.mkdirs()
    sys.props.getOrElseUpdate("derby.system.home", home.toString)
  }

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded-Derby URL for a given input dir (one DB per dataset, fixed
    * path + overwrite semantics — repeated runs reuse, never accumulate). */
  def derbyUrlFor(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"jdbc:derby:$derbyHome/db-$tag;create=true"
  }

  private def props(extra: (String, String)*): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", DerbyDriver)
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** S2-posture partitioned JDBC read: `numPartitions` concurrent
    * range-bounded cursors over `partitionColumn`, recovering to an
    * empty typed frame (logged) when the RDBMS is unreachable or the
    * table is absent — the reference's `safe_fetch` returns `[]` on any
    * driver error and the query keeps running. Schema is explicit in the
    * recovery arm only; the live arm trusts the RDBMS catalog. */
  def loadJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int, schema: StructType): DataFrame =
    // spark.read.jdbc resolves the schema from the RDBMS catalog eagerly,
    // so an unreachable DB or missing table fails HERE, inside the Try —
    // no half-built plan escapes into a later action.
    Try(spark.read.jdbc(url, table, partitionColumn, lowerBound,
      upperBound, numPartitions, props())) match {
      case Success(df) => df
      case Failure(e) =>
        System.err.println(s"[graft] jdbc source $table unavailable, " +
          s"substituting empty relation: ${e.getMessage}")
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** DECLARED SCHEMA-DRIFT POSTURE for the JDBC tier — the parquet rule
    * ([[Formats.readParquetDeclared]]) restated for a source whose
    * schema comes from a LIVE catalog (drift = upstream ALTER TABLE
    * between extracts):
    *  - missing declared column → null-filled via projection (rows
    *    survive, accounted);
    *  - upstream type that widens LOSSLESSLY into the declared type
    *    (INT where BIGINT is declared, REAL where DOUBLE) → cast at the
    *    projection, values exact;
    *  - anything else (VARCHAR where BIGINT, DOUBLE where BIGINT —
    *    a lossy or semantic change) → loud [[SchemaDriftException]]
    *    naming the column and both types, BEFORE any row is fetched
    *    (the catalog resolves eagerly) — silent coercion of an
    *    incompatible upstream change is never the right default for a
    *    training corpus.
    * Extra upstream columns are dropped by the projection (the declared
    * schema IS the contract surface). Pinned in JdbcSpec. */
  class SchemaDriftException(msg: String)
    extends RuntimeException(msg)

  import org.apache.spark.sql.types._

  /** value-preserving widenings the declared read absorbs */
  private def widensTo(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (ByteType | ShortType, IntegerType) => true
      case (ByteType, ShortType) => true
      case (FloatType, DoubleType) => true
      // Derby/Postgres surface DECIMAL for some integral catalogs; an
      // exact-integral decimal that fits widens losslessly into long.
      case (d: DecimalType, LongType) if d.scale == 0 && d.precision <= 18 =>
        true
      case _ => false
    }

  def loadJdbcDeclared(spark: SparkSession, url: String, table: String,
                       partitionColumn: String, lowerBound: Long,
                       upperBound: Long, numPartitions: Int,
                       declared: StructType): DataFrame = {
    val live = loadJdbc(spark, url, table, partitionColumn, lowerBound,
      upperBound, numPartitions, declared)
    // Case-INSENSITIVE name matching, like Spark's default analyzer —
    // RDBMS catalogs fold unquoted identifiers (Derby/Oracle upper,
    // Postgres lower), and a fold difference is not schema drift.
    val liveFields = live.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    val cols = declared.fields.map { f =>
      liveFields.get(f.name.toLowerCase) match {
        case None =>
          lit(null).cast(f.dataType).as(f.name) // null-fill arm
        case Some(t) if widensTo(t, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name) // upcast arm (≥ identity)
        case Some(t) =>
          throw new SchemaDriftException(
            s"jdbc table $table column ${f.name}: upstream type $t " +
              s"cannot widen losslessly into declared ${f.dataType} — " +
              "refusing to coerce; fix the extract contract or re-declare")
      }
    }
    live.select(cols.toIndexedSeq: _*)
  }

  private val ordersJdbcSchema = StructType.fromDDL(
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "total_cents BIGINT")

  /** Seed the embedded RDBMS from the parquet original — the inverse of
    * the reference's extract, used as test/bench fixture setup. The
    * write is itself distributed (`df.write.jdbc`, a few concurrent
    * insert connections; embedded Derby serializes at the latch, a real
    * Postgres takes them in parallel). Exact integer cents travel, not
    * doubles — text/JDBC round-trips must not re-round. Memoized per
    * (session, dir): Verify and Bench seed once. */
  def seedOrders(spark: SparkSession, dir: String): String =
    graft.Memo.get(spark, "jdbc-seed-orders", dir) {
      val url = derbyUrlFor(dir)
      graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          graft.operators.Relational.cents(col("o_totalprice"))
            .as("total_cents"))
        .coalesce(4)
        // 10k-row insert batches: the default 1000 pays 10× the
        // per-round-trip latency on a bulk seed.
        .write.mode("overwrite")
        .jdbc(url, "orders", props("batchsize" -> "10000"))
      url
    }

  /** Partition bounds from the parquet min/max, memoized per dir (in
    * production: the RDBMS's own `SELECT min,max` — same two-value query
    * either way); a stale or loose bound only skews partition sizes,
    * never correctness (Spark's first/last range partitions are
    * unbounded below/above). */
  private def orderKeyBounds(spark: SparkSession, dir: String): (Long, Long) =
    graft.Memo.get(spark, "jdbc-orders-bounds", dir) {
      val r = graft.Tables.load(spark, dir, "orders")
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }

  /** The registry row: seed, partitioned read-back, exact aggregate. */
  def ordersJdbcCounts(spark: SparkSession, dir: String,
                       numPartitions: Int = 8): DataFrame = {
    val url = seedOrders(spark, dir)
    val bounds = orderKeyBounds(spark, dir)
    val live = loadJdbc(spark, url, "orders", "o_orderkey",
      bounds._1, bounds._2 + 1, numPartitions,
      ordersJdbcSchema)
    live.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        (sum(col("total_cents")) / lit(100.0)).as("sum_value"))
      .orderBy("o_orderstatus")
  }

  /** Point lookup THROUGH the JDBC source: the equality predicate is
    * pushed into the remote WHERE clause (PushedFilters — plan-asserted
    * in JdbcSpec), so the RDBMS ships one row, not one table. Mirrors
    * the parquet `point_lookup` row, proving pushdown parity across
    * source families. */
  def ordersJdbcLookup(spark: SparkSession, dir: String,
                       orderKey: Long = 1L): DataFrame = {
    val url = seedOrders(spark, dir)
    val bounds = orderKeyBounds(spark, dir)
    loadJdbc(spark, url, "orders", "o_orderkey",
      bounds._1, bounds._2 + 1, 8, ordersJdbcSchema)
      .filter(col("o_orderkey") === orderKey)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("total_cents") / lit(100.0)).as("o_totalprice"))
  }
}

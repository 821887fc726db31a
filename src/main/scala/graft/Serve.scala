package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

/** The reference's demo front door (reference `app/main.py:11-135`, a
  * FastAPI service over Neo4j), re-expressed as a minimal pure-JDK HTTP
  * layer over the engine:
  *
  *   GET /health                  → {"ok": true}            (S7 probe)
  *   GET /etl                     → {"ok": true}            (materialize graph)
  *   GET /recs?product_id=N      → {"items": […], "took_ms": n}
  *   GET /recs?customer_id=N     → {"items": […], "took_ms": n}
  *   GET /recs?customer_id=N&arm=ppr → same shape, Personalized-PageRank
  *       ranking (the reference's declared GDS upgrade, main.py:31-33),
  *       cascading back to the co-occurrence arms for unknown seeds
  *   GET /recs?product_id=N&arm=item → same shape, served from the
  *       precomputed item-item shelf (the item_item_topk row)
  *   GET /recs?product_id=N&arm=rrf  → same shape, reciprocal-rank
  *       fusion of the two product arms (the rec_rrf_fusion row)
  *       — every arm cascades to the reference's default chain when it
  *       has no signal for the seed
  *
  * Same wire shapes, same fallback cascade (co-occurrence → same-category,
  * reference `app/main.py:61,70-71`), same graceful degradation (any
  * engine error → 200 with empty items, `app/main.py:124-126`). The
  * serving path is the engine's top-k plans — the ONLY driver-side
  * materialization is the k-row collect behind the limit
  * (operators/Json.toItemsJson). This is a demo shim, deliberately thin:
  * a production deployment would put the same calls behind a real app
  * server; nothing in the engine changes.
  */
object Serve {

  /** Start the service; port 0 binds an ephemeral port (tests). */
  def start(spark: SparkSession, dir: String, port: Int): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    // Degraded payloads are PER-ENDPOINT: a health checker parses the
    // `ok` field (the reference's /health contract), so a failing probe
    // must answer {"ok": false} — an items-shaped body would read as
    // unparseable-but-200 to it.
    server.createContext("/health", handler("""{"ok": false}""") { _ =>
      // An actual engine liveness probe (SELECT 1), not a constant.
      val ok = Tables.healthProbe(spark).count() == 1L
      s"""{"ok": ${ok}}"""
    })
    server.createContext("/etl", handler("""{"ok": false}""") { _ =>
      // The reference's /etl rebuilds the graph synchronously
      // (app/main.py:17-19); here that is materializing the node and
      // edge relations the recs queries serve from.
      val n = graph.GraphBuilder.nodes(spark, dir).count()
      val e = graph.GraphBuilder.edges(spark, dir).count()
      s"""{"ok": ${n > 0 && e > 0}}"""
    })
    server.createContext("/recs",
        handler("""{"items": [], "took_ms": 0}""") { ex =>
      val started = System.nanoTime()
      val params = queryParams(ex)
      val items =
        try {
          params.get("product_id").flatMap(id => id.toLongOption).map { pid =>
            // Product-seed arms (VERDICT r14 item 4): `arm=item` serves
            // the precomputed item-item shelf, `arm=rrf` the
            // rank-fusion tier — both the exact oracle-pinned rows
            // projected to the wire shape, both cascading to the
            // reference's co-occurrence→same-category default when the
            // seed has no signal under the chosen arm. Any other arm
            // value leaves the default cascade untouched.
            val armItems = params.get("arm") match {
              case Some("item") => operators.Json.toItemsArray(
                graph.GraphAlgs.itemItemServing(spark, dir, pid))
              case Some("rrf") => operators.Json.toItemsArray(
                operators.Recs.rrfServing(spark, dir, pid))
              case _ => "[]"
            }
            if (armItems != "[]") armItems
            else operators.Json.toItemsArray(
              operators.Recs.recsForProduct(spark, dir, pid))
          }.orElse {
            params.get("customer_id").flatMap(_.toLongOption).map { cid =>
              // The reference's declared upgrade (main.py:31-33): with
              // ?arm=ppr the customer arm serves Personalized PageRank —
              // the exact fixed-iteration tier the ppr_fixed_recs oracle
              // row pins — cascading to the co-occurrence arms when the
              // seed has no propagated mass (unknown customer), the same
              // degradation posture as the reference's GDS-absent path.
              val usePpr = params.get("arm").contains("ppr")
              // Render the PPR arm ONCE (ADVICE r14: the old
              // isEmpty-then-render pair ran the top-k stage twice);
              // pprRecsServing returns a local relation, so the empty
              // probe on the rendered array is free.
              val pprItems =
                if (usePpr)
                  operators.Json.toItemsArray(
                    graph.GraphAlgs.pprRecsServing(spark, dir, cid))
                else "[]"
              if (usePpr && pprItems != "[]") pprItems
              else operators.Json.toItemsArray(
                operators.Recs.recsForCustomer(spark, dir, cid))
            }
          }.getOrElse("[]") // neither provided → empty list (main.py:123)
        } catch { case scala.util.control.NonFatal(_) => "[]" }
      val tookMs = (System.nanoTime() - started) / 1000000L
      s"""{"items": $items, "took_ms": $tookMs}"""
    })
    // Bounded worker pool: serving-path queries are top-k plans, but an
    // unbounded thread-per-request executor would let slow queries pile
    // up without backpressure.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server
  }

  private def handler(degraded: String)(
      body: HttpExchange => String): HttpHandler =
    (ex: HttpExchange) => {
      val (status, payload) =
        try (200, body(ex))
        catch {
          // Degrade like the reference: a broken engine yields an empty,
          // well-formed response IN THIS ENDPOINT'S SHAPE, never a 500
          // stack trace (app/main.py:124-126).
          case scala.util.control.NonFatal(_) => (200, degraded)
        }
      val bytes = payload.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").iterator
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).flatMap(_.toIntOption).getOrElse(8080)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, dir, port)
    println(s"graft serving $dir on port " +
      s"${server.getAddress.getPort} (/health /etl /recs)")
    Thread.currentThread().join() // serve until killed
  }
}

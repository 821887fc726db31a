package graft

/** End-to-end smoke of the demo HTTP front door: real socket, real
  * requests, the engine's actual top-k plans behind them. */
class ServeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def get(port: Int, path: String): String = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
    val conn = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      assert(conn.getResponseCode == 200)
      new String(conn.getInputStream.readAllBytes(), "UTF-8")
    } finally conn.disconnect()
  }

  test("health, etl, and both recs endpoints serve the reference shapes") {
    val server = Serve.start(spark, dir, port = 0) // ephemeral
    try {
      val port = server.getAddress.getPort
      assert(get(port, "/health") == """{"ok": true}""")
      assert(get(port, "/etl") == """{"ok": true}""")
      val prod = get(port, "/recs?product_id=1")
      assert(prod.contains(""""items": [{""") && prod.contains(""""took_ms":"""))
      assert(prod.contains(""""product_id":""") && prod.contains(""""score":""")
        && prod.contains(""""reason":"""))
      val cust = get(port, "/recs?customer_id=1")
      assert(cust.contains(""""items": [""") && cust.contains(""""took_ms":"""))
      // Neither param → 200 with an empty list, like the reference.
      val none = get(port, "/recs")
      assert(none.contains(""""items": []"""))
      // Unparseable id → graceful empty, not a 500.
      val bad = get(port, "/recs?product_id=notanumber")
      assert(bad.contains(""""items": []"""))
    } finally server.stop(0)
  }

  test("a broken engine degrades per-endpoint: ok:false probes, empty recs") {
    // A dir with no tables: /health stays true (the liveness probe is
    // engine-only), but /etl and /recs hit missing parquet — each must
    // answer 200 in ITS OWN shape (a checker parses /etl for `ok`; an
    // items body would read as unparseable).
    val server = Serve.start(spark, "/nonexistent-graft-dir", port = 0)
    try {
      val port = server.getAddress.getPort
      assert(get(port, "/health") == """{"ok": true}""")
      assert(get(port, "/etl") == """{"ok": false}""")
      val recs = get(port, "/recs?product_id=1")
      assert(recs.contains(""""items": []""") &&
        recs.contains(""""took_ms":"""))
    } finally server.stop(0)
  }
}

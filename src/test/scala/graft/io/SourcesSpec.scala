package graft.io

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec
import graft.config.SourceConfig

/** REST API source (operator S5) driven against a real in-process HTTP
  * server — request, auth header, JSON-lines inference, error paths.
  */
class SourcesSpec extends SparkSpec {

  private def cfg(url: String, opts: Map[String, String] = Map.empty) =
    SourceConfig("api_src", "api", url, "json", opts, "bronze.api", "full", None, enabled = true)

  private def withServer(payload: String, status: Int = 200)
      (body: (String, () => Option[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var authHeader: Option[String] = None
    server.createContext("/feed", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        authHeader = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val bytes = payload.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://localhost:${server.getAddress.getPort}/feed", () => authHeader)
    finally server.stop(0)
  }

  test("api source infers schema from a JSON-lines payload") {
    val payload =
      """{"id": 1, "name": "ann"}
        |{"id": 2, "name": "bob"}""".stripMargin
    withServer(payload) { (url, _) =>
      val df = Sources.read(spark, cfg(url))
      assert(df.count() == 2)
      assert(df.columns.sorted.toSeq == Seq("id", "name"))
    }
  }

  test("api source sends the bearer token from options") {
    withServer("""{"ok": true}""") { (url, auth) =>
      Sources.read(spark, cfg(url, Map("auth_token" -> "tok123"))).collect()
      assert(auth().contains("Bearer tok123"))
    }
  }

  test("api source surfaces HTTP errors with the source id") {
    withServer("""{"err": "nope"}""", status = 503) { (url, _) =>
      val e = intercept[RuntimeException](Sources.read(spark, cfg(url)))
      assert(e.getMessage.contains("api_src") && e.getMessage.contains("503"))
    }
  }

  test("jdbc source pushes a full query to the database (embedded Derby)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE tx (id INT, amount DOUBLE)")
      st.execute("INSERT INTO tx VALUES (1, 10.5), (2, 20.0), (3, 5.25)")
    } finally conn.close()

    val df = Sources.read(spark, SourceConfig("db_src", "jdbc", url, "",
      Map("query" -> "SELECT id, amount FROM tx WHERE amount > 6",
        "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"),
      "bronze.tx", "full", None, enabled = true))
    assert(df.count() == 2)
    assert(df.columns.map(_.toLowerCase).sorted.toSeq == Seq("amount", "id"))
  }
}

package graft

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.nio.charset.StandardCharsets
import graft.nl.{Ollama, Patterns}
import org.scalatest.funsuite.AnyFunSuite

/** r8/r9 carried item: stubbed-HTTP Ollama smoke — a local HTTP server
  * plays /api/generate, so the prompt construction (schema context
  * injection), markdown stripping, and the REST confirmation gate for
  * destructive LLM SQL (reference `main.go:292-303` analogue) are all
  * pinned offline, no model required.
  */
class NlOllamaSpec extends AnyFunSuite {

  /** Start a one-route stub that records the last request body and
    * returns `response` as the Ollama JSON payload.
    */
  private def withStub(response: String)(f: (String, () => String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastBody = ""
    server.createContext("/api/generate", ex => {
      lastBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val esc = response.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c => c.toString
      }
      val body = s"""{"model":"stub","response":"$esc","done":true}"""
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastBody)
    finally server.stop(0)
  }

  private val tables = Seq(
    Patterns.TableInfo("employees", Seq("id", "name", "salary")),
    Patterns.TableInfo("depts", Seq("dept_id", "dept_name")))

  test("prompt carries the schema context and the question") {
    val p = Ollama.buildPrompt("who earns the most", tables)
    assert(p.contains("employees(id, name, salary)"))
    assert(p.contains("depts(dept_id, dept_name)"))
    assert(p.contains("Question: who earns the most"))
  }

  test("translate posts the prompt and strips markdown fences from the reply") {
    withStub("```sql\nSELECT * FROM employees;\n```") { (url, lastBody) =>
      val got = Ollama.translate("show employees", tables,
        Ollama.Config(url = url, enabled = true))
      assert(got === Some("SELECT * FROM employees"))
      // the posted body carries model, prompt with injected schema, stream off
      val body = lastBody()
      assert(body.contains("\"stream\":false"))
      assert(body.contains("employees(id, name, salary)"))
      assert(body.contains("Question: show employees"))
    }
  }

  test("translate returns None when disabled, on non-200, and on junk replies") {
    withStub("I cannot help with that.") { (url, _) =>
      assert(Ollama.translate("x", tables,
        Ollama.Config(url = url, enabled = true)).isEmpty)
      assert(Ollama.translate("x", tables,
        Ollama.Config(url = url, enabled = false)).isEmpty)
    }
    // connection refused -> None, not an exception
    assert(Ollama.translate("x", tables,
      Ollama.Config(url = "http://127.0.0.1:9", enabled = true)).isEmpty)
  }

  test("REST confirmation gate: destructive LLM SQL needs confirm:true") {
    val spark = SparkTestSession.spark
    withStub("DELETE FROM gate_t WHERE id = 1") { (url, _) =>
      val dbPath = java.nio.file.Files
        .createTempDirectory("graft_ollama_gate").toString
      val engine = new Engine(spark, dbPath,
        Ollama.Config(url = url, enabled = true))
      engine.execute("CREATE TABLE gate_t (id INT, name TEXT)")
      engine.execute("INSERT INTO gate_t (id, name) VALUES (1, 'a')")
      engine.execute("INSERT INTO gate_t (id, name) VALUES (2, 'b')")
      val srv = new Server(engine, 0)
      srv.start()
      try {
        val client = HttpClient.newHttpClient()
        def post(json: String): String = {
          val req = HttpRequest.newBuilder()
            .uri(URI.create(s"http://127.0.0.1:${srv.boundPort}/api/query"))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(json)).build()
          client.send(req, HttpResponse.BodyHandlers.ofString()).body()
        }
        // NL the deterministic patterns cannot translate -> Ollama stub
        // -> destructive SQL -> gate trips, nothing executes
        val q = """{"query":"please obliterate record one","isNatural":true}"""
        val r1 = post(q)
        assert(r1.contains("\"requiresConfirmation\":true"), r1)
        assert(r1.contains("DELETE FROM gate_t WHERE id = 1"))
        assert(engine.execute("SELECT COUNT(*) FROM gate_t")
          .toOption.get.collect()(0).getLong(0) === 2L)
        // re-sent with confirm:true -> executes
        val r2 = post(
          """{"query":"please obliterate record one","isNatural":true,"confirm":true}""")
        assert(!r2.contains("requiresConfirmation"), r2)
        assert(engine.execute("SELECT COUNT(*) FROM gate_t")
          .toOption.get.collect()(0).getLong(0) === 1L)
      } finally srv.stop()
    }
  }
}

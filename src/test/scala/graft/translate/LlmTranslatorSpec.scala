package graft.translate

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** LlmTranslator against a local OpenAI-compatible fake server (JDK
  * HttpServer — no network egress): request contract, response
  * extraction, health check, and error paths.
  */
class LlmTranslatorSpec extends AnyFunSuite {

  private def withServer(status: Int, responseBody: String)
      (f: (String, () => String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastRequest = ""
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastRequest = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val bytes = responseBody.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastRequest)
    finally server.stop(0)
  }

  private def completion(content: String): String =
    s"""{"choices": [{"message": {"role": "assistant", "content": ${q(content)}}}]}"""

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  test("toSql posts the prompt contract and returns the completion text") {
    withServer(200, completion("SELECT COUNT(*) FROM customers LIMIT 5")) { (url, lastReq) =>
      val t = new LlmTranslator(url, "test-model")
      val sql = t.toSql("How many customers?", "CREATE TABLE customers (...)", topK = 5)
      assert(sql == "SELECT COUNT(*) FROM customers LIMIT 5")
      val req = lastReq()
      // client params mirrored from the reference (app-gradio.py:53-67)
      assert(req.contains("\"temperature\": 0.7"))
      assert(req.contains("\"top_p\": 0.9"))
      assert(req.contains("\"seed\": 42"))
      assert(req.contains("\"max_tokens\": 4096"))
      assert(req.contains("test-model"))
      // the 3-CRITICAL-RULES prompt contract reaches the server
      assert(req.contains("CRITICAL RULES"))
      assert(req.contains("How many customers?"))
    }
  }

  test("healthCheck is true on a sane completion, false on server error") {
    withServer(200, completion("Paris")) { (url, _) =>
      assert(new LlmTranslator(url, "m").healthCheck())
    }
    withServer(500, "boom") { (url, _) =>
      assert(!new LlmTranslator(url, "m").healthCheck())
    }
    // unreachable server
    assert(!new LlmTranslator("http://127.0.0.1:1", "m",
      timeout = java.time.Duration.ofMillis(300)).healthCheck())
  }

  test("non-200 responses raise with the status and body") {
    withServer(503, "overloaded") { (url, _) =>
      val e = intercept[RuntimeException](
        new LlmTranslator(url, "m").toSql("q", "info"))
      assert(e.getMessage.contains("503") && e.getMessage.contains("overloaded"))
    }
  }

  test("malformed completion payloads raise, not return garbage") {
    withServer(200, """{"unexpected": true}""") { (url, _) =>
      val e = intercept[RuntimeException](
        new LlmTranslator(url, "m").toSql("q", "info"))
      assert(e.getMessage.contains("unexpected completion payload"))
    }
  }

  test("extractContent handles escapes in the completion") {
    val t = new LlmTranslator("http://unused", "m")
    val json = completion("SELECT 'it''s' AS v\nFROM t")
    assert(t.extractContent(json) == "SELECT 'it''s' AS v\nFROM t")
  }

  test("a fenced completion cleans to runnable SQL through the app's " +
      "cleanup seam (wire shape end-to-end, zero network)") {
    withServer(200,
      completion("```sql\nSELECT COUNT(*) FROM customers;\n```")) { (url, _) =>
      val raw = new LlmTranslator(url, "m").toSql("how many?", "info")
      assert(graft.sql.SqlCleanup.clean(raw) == "SELECT COUNT(*) FROM customers")
    }
  }
}

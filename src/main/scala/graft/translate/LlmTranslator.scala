package graft.translate

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** OpenAI-compatible `/v1/chat/completions` client translator.
  *
  * Mirrors the reference's serving contract (`fastapi-llm.py:64-112`) and
  * client parameters (`app-gradio.py:53-67`: temperature 0.7, top_p 0.9,
  * seed 42, max_tokens 4096, 120 s timeout). Offline environments never
  * construct this class — all gates run [[RuleTranslator]].
  */
final class LlmTranslator(
    baseUrl: String,
    model: String,
    temperature: Double = 0.7,
    topP: Double = 0.9,
    seed: Int = 42,
    maxTokens: Int = 4096,
    timeout: Duration = Duration.ofSeconds(120)) extends QueryTranslator {

  private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  override def toSql(question: String, tableInfo: String, topK: Int = 50): String = {
    val prompt = QueryTranslator.prompt(tableInfo, question, topK)
    chat(prompt)
  }

  override def healthCheck(): Boolean =
    // The reference's startup sanity question (`all_in_one_PC.py:105-116`).
    try chat("What is the capital of France? Answer in one word.").nonEmpty
    catch { case _: Exception => false }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def chat(userContent: String): String = {
    val body =
      s"""{"model": ${jsonStr(model)}, "messages": [{"role": "user", "content": ${jsonStr(userContent)}}],
         | "temperature": $temperature, "top_p": $topP, "seed": $seed, "max_tokens": $maxTokens}"""
        .stripMargin.replace("\n", "")
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/v1/chat/completions"))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"LLM server HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    extractContent(resp.body())
  }

  /** Minimal JSON extraction of choices[0].message.content — avoids a JSON
    * dependency in the hot path; jackson (on the Spark classpath) is used
    * as the strict fallback. */
  private[translate] def extractContent(json: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val content = node.path("choices").path(0).path("message").path("content")
    if (content.isMissingNode)
      throw new RuntimeException(s"unexpected completion payload: ${json.take(300)}")
    content.asText()
  }
}

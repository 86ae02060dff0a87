package graft.translate

/** NL→SQL translation seam.
  *
  * The reference's pipeline step 2 (`create_sql_query_chain`,
  * `app-gradio.py:129-145`) is an LLM call; everything downstream only
  * needs "question + schema context → SQL text". Keeping it behind a trait
  * makes the engine hermetic for tests (RuleTranslator) while preserving
  * the LLM path (LlmTranslator) as a drop-in.
  */
trait QueryTranslator {

  /** @param question  user NL question
    * @param tableInfo schema context: DDL + sample rows per table
    *                  (the `{table_info}` slot, `app-gradio.py:135`)
    * @param topK      result bound injected into the prompt
    *                  (`{top_k}`, `app-gradio.py:140`)
    * @return raw model/sql text; callers pass it through SqlCleanup
    */
  def toSql(question: String, tableInfo: String, topK: Int = 50): String

  /** Startup sanity check (the reference asks "capital of France",
    * `all_in_one_PC.py:105-116`). */
  def healthCheck(): Boolean = true
}

object QueryTranslator {

  /** Prompt contract carried over verbatim in spirit from
    * `app-gradio.py:132-143` — the three CRITICAL RULES are the behavioral
    * spec our rewriters enforce post-hoc. */
  def prompt(tableInfo: String, question: String, topK: Int): String =
    s"""You are an expert SQL developer. Given an input question, create a
       |syntactically correct SQL query to run.
       |
       |CRITICAL RULES:
       |1. STUDY THE SCHEMA below and join the tables if necessary.
       |2. Reply with ONE single SQL statement only. No explanation.
       |3. If the question mentions system time, apply
       |   FOR SYSTEM_TIME AS OF 'YYYY-MM-DD HH:MI:SS' on every table.
       |
       |Limit the number of results to $topK.
       |
       |Schema:
       |$tableInfo
       |
       |Question: $question
       |SQLQuery:""".stripMargin
}

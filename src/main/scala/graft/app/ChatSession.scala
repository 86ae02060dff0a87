package graft.app

import graft.present.PlotDecision

/** One chat message — the reference's Gradio `type="messages"` dict
  * shape (`app-gradio.py:111,124-125`). */
final case class ChatMessage(role: String, content: String)

/** Headless chat-history state machine — the multi-turn session state
  * the reference keeps in `gr.State([])` + `gr.Chatbot`
  * (`app-gradio.py:103,119-295`), with the UI widgets factored out
  * (SURVEY §2.9: engine owns the state machine, not the rendering).
  *
  * The reference's generator contract, mirrored exactly:
  * - `ask` first appends the user turn and an assistant "🤔 Thinking..."
  *   placeholder (`app-gradio.py:124-125`), then every later stage
  *   REPLACES the trailing assistant message in place
  *   (`history[-1] = …`, `app-gradio.py:162,166,179,258,277`);
  * - `onYield` fires with the full history after every mutation — the
  *   sequence of states the generator yields into the Chatbot, so a
  *   streaming UI renders identically;
  * - prior turns are never rewritten: a session accumulates
  *   (user, assistant-final) pairs across `ask` calls;
  * - the plot pane shows only when the final answer carried a plottable
  *   decision, and `clear()` resets history and plot together
  *   (`clear_history`, `app-gradio.py:286-289`).
  */
final class ChatSession(predictor: Predictor) {

  private var messages = Vector.empty[ChatMessage]
  private var lastPlot: Option[PlotDecision] = None

  /** Current history, oldest first — the Chatbot's value. */
  def history: Seq[ChatMessage] = messages

  /** Plot currently shown next to the chat (None = hidden pane). */
  def visiblePlot: Option[PlotDecision] = lastPlot

  /** Run one turn against the engine. Returns the full predict result;
    * the session's history gains exactly two messages (the user turn
    * and the assistant's final state). */
  def ask(question: String,
      onYield: Seq[ChatMessage] => Unit = _ => ()): PredictResult = {
    messages :+= ChatMessage("user", question)
    var assistantAppended = false
    val result = predictor.predict(question, emit = msg => {
      if (!assistantAppended) {
        messages :+= ChatMessage("assistant", msg)
        assistantAppended = true
      } else messages = messages.init :+ ChatMessage("assistant", msg)
      onYield(messages)
    })
    // the reference flips the pane visible on the summarize yield and
    // leaves it showing the LAST produced figure until the next turn or
    // a clear (`gr.update(value=plot_figure, visible=…)`)
    lastPlot = result.plot
    result
  }

  /** The Clear History button: empty chat, hidden plot. */
  def clear(): Unit = {
    messages = Vector.empty
    lastPlot = None
  }
}

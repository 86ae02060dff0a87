package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One committed table version.
  *
  * Mirrors the observable Iceberg snapshot semantics the reference relies
  * on (one snapshot per batched INSERT, `create_iceberg.py:158-160`; table
  * history inspected in Hue, `README.md:94-98`; time travel
  * `app-gradio.py:138`) without the Iceberg runtime (not on the offline
  * classpath — see SURVEY.md §1.5).
  *
  * `files` are paths relative to the table root so a table directory can be
  * relocated (e.g. copied into a test temp dir) without rewriting the log.
  */
final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String, // "append" | "replace" | "delete"
    files: Seq[String],
    recordCount: Long,
    summary: Map[String, String] = Map.empty)

/** Append-only JSON commit log: `<tableDir>/snapshots.json`.
  *
  * Equivalent of Iceberg's snapshot list in `metadata.json`. Commits are
  * atomic (write temp file + atomic move), so a reader never observes a
  * torn log; last-writer-wins is acceptable for the single-writer batch
  * loads the reference performs (`append_iceberg.py:182-215`).
  */
object SnapshotLog {
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def logPath(tableDir: Path): Path = tableDir.resolve("snapshots.json")

  def read(tableDir: Path): Seq[Snapshot] = {
    val p = logPath(tableDir)
    if (!Files.exists(p)) Seq.empty
    else {
      val node = mapper.readTree(Files.readString(p))
      node.elements().asScala.map { e =>
        Snapshot(
          id = e.get("id").asLong(),
          timestampMs = e.get("timestampMs").asLong(),
          operation = e.get("operation").asText(),
          files = e.get("files").elements().asScala.map(_.asText()).toSeq,
          recordCount = e.get("recordCount").asLong(),
          summary =
            if (e.has("summary"))
              e.get("summary").properties().asScala
                .map(kv => kv.getKey -> kv.getValue.asText()).toMap
            else Map.empty
        )
      }.toSeq.sortBy(_.id)
    }
  }

  def write(tableDir: Path, snapshots: Seq[Snapshot]): Unit = {
    Files.createDirectories(tableDir)
    val json = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(snapshots.sortBy(_.id))
    val tmp = tableDir.resolve(s"snapshots.json.tmp${System.nanoTime()}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, logPath(tableDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a commit; returns the new snapshot. Explicit `timestampMs`
    * keeps tests deterministic (SURVEY.md §7.4 — injected commit times).
    */
  def commit(
      tableDir: Path,
      operation: String,
      newFiles: Seq[String],
      recordCount: Long,
      timestampMs: Long = System.currentTimeMillis(),
      replaceAll: Boolean = false,
      summary: Map[String, String] = Map.empty): Snapshot = {
    val existing = read(tableDir)
    val id = existing.map(_.id).maxOption.getOrElse(0L) + 1L
    val files =
      if (replaceAll) newFiles
      else existing.lastOption.map(_.files).getOrElse(Seq.empty) ++ newFiles
    val snap = Snapshot(id, timestampMs, operation, files, recordCount, summary)
    write(tableDir, existing :+ snap)
    snap
  }

  /** Time travel: newest snapshot with commit time <= asOfMs
    * (`FOR SYSTEM_TIME AS OF`, `app-gradio.py:138`, `README.md:100-107`).
    */
  def resolve(tableDir: Path, asOfMs: Option[Long]): Option[Snapshot] = {
    val all = read(tableDir)
    asOfMs match {
      case None     => all.lastOption
      case Some(ts) => all.filter(_.timestampMs <= ts).lastOption
    }
  }
}

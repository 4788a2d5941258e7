package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import com.fasterxml.jackson.databind.ObjectMapper

/** Structured JSON-lines run log — the engine's counterpart of the
  * reference's structlog setup (/root/reference/src/
  * open_molecule_data_pipeline/logging_utils.py:1-47): every pipeline
  * event is one machine-parseable JSON object with a timestamp, an
  * event name, and key-value fields, appended to
  * `<output_dir>/run-log.jsonl`.
  *
  * Appends are synchronized (sources run as parallel futures) and the
  * clock is injectable so specs pin exact lines. Field values are
  * limited to JSON scalars — an event log is flat by design.
  */
final class RunLog(path: String, clock: () => Long = System.currentTimeMillis) {

  private val mapper = new ObjectMapper()
  private val p = Paths.get(path)
  Option(p.getParent).foreach(Files.createDirectories(_))

  def log(event: String, fields: (String, Any)*): Unit = synchronized {
    val node = mapper.createObjectNode()
    node.put("ts_ms", clock())
    node.put("event", event)
    fields.foreach { case (k, v) =>
      v match {
        case s: String => node.put(k, s)
        case i: Int => node.put(k, i)
        case l: Long => node.put(k, l)
        case b: Boolean => node.put(k, b)
        case d: Double => node.put(k, d)
        case other => node.put(k, String.valueOf(other))
      }
    }
    Files.write(p, (node.toString + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TimestampPatterns

/**
 * Raw log-file ingestion — the reference's primary input path re-expressed:
 * files are read in parallel (task granularity = file, exactly the
 * reference's archive-granularity parallelism), and within a file lines are
 * grouped into log events by the reference's boundary rule: a line STARTS a
 * new event iff a known timestamp pattern parses on it; timestamp-less lines
 * (stack traces, wrapped output) append to the previous event
 * (components/core/src/clp/MessageParser.cpp:84-165). The timestamp is
 * extracted from the text — pattern id + epoch + byte offset are kept so the
 * original event is reconstructable byte-for-byte
 * (streaming_archive/reader/Archive.cpp:163-195 re-insertion).
 */
object RawLogIngest {

  /** One split event; `text` has the timestamp excised (patternId < 0 means
    * the event had none, e.g. a file preamble). */
  final case class RawEvent(eventIdx: Int, patternId: Int, epochMs: Long,
                            tsBegin: Int, text: String)

  /** Byte-exact inverse of the split: re-splice the formatted timestamp. */
  def reconstruct(e: RawEvent): String =
    if (e.patternId < 0) e.text
    else e.text.substring(0, e.tsBegin) +
      TimestampPatterns.format(e.patternId, e.epochMs) +
      e.text.substring(e.tsBegin)

  /** Groups a file's lines into events by the timestamp boundary rule. */
  def splitEvents(content: String): Vector[RawEvent] = {
    val out = Vector.newBuilder[RawEvent]
    var idx = 0
    // current event accumulator
    var curPattern = -1
    var curEpoch = 0L
    var curBegin = 0
    val cur = new java.lang.StringBuilder
    var open = false

    def flush(): Unit = if (open) {
      out += RawEvent(idx, curPattern, curEpoch, curBegin, cur.toString)
      idx += 1
      cur.setLength(0)
      open = false
    }

    var lineStart = 0
    val n = content.length
    while (lineStart < n) {
      var lineEnd = content.indexOf('\n', lineStart)
      if (lineEnd < 0) lineEnd = n
      val line = content.substring(lineStart, lineEnd)
      TimestampPatterns.searchFull(line) match {
        case Some(m) => // timestamped line starts a new event
          flush()
          open = true
          curPattern = m.patternId
          curEpoch = m.epochMs
          curBegin = m.begin
          cur.append(line, 0, m.begin).append(line, m.end, line.length)
        case None => // continuation line (or file preamble before any ts)
          if (!open) { open = true; curPattern = -1; curEpoch = 0L; curBegin = 0 }
          else cur.append('\n')
          cur.append(line)
      }
      lineStart = lineEnd + 1
    }
    flush()
    out.result()
  }

  /** Whole-file split to events: `binaryFile` scan (one task per file — the
    * reference parses each file sequentially too) → per-file event rows.
    * Columns: file, event_idx, pattern_id, epoch_ms, ts_begin, text. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        splitEvents(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          .map(e => (name, e.eventIdx, e.patternId, e.epochMs, e.tsBegin, e.text))
      }
      .toDF("file", "event_idx", "pattern_id", "epoch_ms", "ts_begin", "text")
  }

  /** Adapts split events to the engine's Turn input shape (conv = file). */
  def asTurns(events: DataFrame): DataFrame =
    events.select(
      col("file").as("conv_id"),
      col("event_idx").as("turn_idx"),
      lit("log").as("role"),
      col("text"),
      lit("raw").as("tool"),
      timestamp_millis(col("epoch_ms")).as("ts"))
}

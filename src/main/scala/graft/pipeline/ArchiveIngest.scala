package graft.pipeline

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/**
 * Archive-format input (SURVEY §2.1 S2): log files inside zip / tar /
 * tar.gz / gz containers, split into events by the same timestamp-boundary
 * rule as loose files — the reference reads archives through libarchive
 * (components/core/src/clp/LibarchiveReader.cpp, LibarchiveFileReader.cpp);
 * here each archive is one `binaryFile` task (the reference's
 * archive-granularity parallelism) and entries stream through
 * [[RawLogIngest.splitEvents]].
 *
 * Scale note: one task per archive is the right granularity when archives
 * are the unit users upload; entries inside decompress as a stream — no
 * entry is ever fully materialized beyond its own bytes.
 */
object ArchiveIngest {

  /** (entryName, content) pairs of a supported archive; bare .gz yields one
    * pseudo-entry named after the stripped file name. */
  def entries(name: String, bytes: Array[Byte]): Iterator[(String, Array[Byte])] = {
    val lower = name.toLowerCase
    if (lower.endsWith(".zip")) zipEntries(new ZipInputStream(new ByteArrayInputStream(bytes)))
    else if (lower.endsWith(".tar.gz") || lower.endsWith(".tgz"))
      tarEntries(new TarArchiveInputStream(new GZIPInputStream(new ByteArrayInputStream(bytes))))
    else if (lower.endsWith(".tar"))
      tarEntries(new TarArchiveInputStream(new ByteArrayInputStream(bytes)))
    else if (lower.endsWith(".gz"))
      Iterator((name.substring(0, name.length - 3),
        new GZIPInputStream(new ByteArrayInputStream(bytes)).readAllBytes()))
    else Iterator((name, bytes)) // not an archive: pass through as one entry
  }

  private def zipEntries(zin: ZipInputStream): Iterator[(String, Array[Byte])] =
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .map(e => (e.getName, zin.readAllBytes()))

  private def tarEntries(tin: TarArchiveInputStream): Iterator[(String, Array[Byte])] =
    Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .map(e => (e.getName, tin.readAllBytes()))

  /** Archive scan → per-entry event rows (same shape as
    * [[RawLogIngest.read]] plus the `archive` column). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val archive = p.substring(p.lastIndexOf('/') + 1)
        entries(archive, bytes).flatMap { case (entryName, content) =>
          RawLogIngest.splitEvents(
              new String(content, java.nio.charset.StandardCharsets.UTF_8))
            .map(e => (archive, entryName, e.eventIdx, e.patternId, e.epochMs, e.tsBegin, e.text))
        }
      }
      .toDF("archive", "file", "event_idx", "pattern_id", "epoch_ms", "ts_begin", "text")
  }
}

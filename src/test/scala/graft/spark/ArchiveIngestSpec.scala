package graft.spark

import java.nio.file.Files

import graft.pipeline.ArchiveIngest

/** S2 archive input: zip/tar/gz entries stream through the same
  * timestamp-boundary split as loose log files. */
class ArchiveIngestSpec extends SparkSpecBase {

  private val log1 = "2024-01-01 00:00:01 alpha line\n2024-01-01 00:00:02 beta line\n  continuation"
  private val log2 = "2024-01-01 00:00:03 gamma line"

  test("zip, tar.gz, and bare gz entries all split into events") {
    val dir = Files.createTempDirectory("graft-arch-spec")
    val zout = new java.util.zip.ZipOutputStream(Files.newOutputStream(dir.resolve("a.zip")))
    zout.putNextEntry(new java.util.zip.ZipEntry("one.log"))
    zout.write(log1.getBytes("UTF-8")); zout.closeEntry(); zout.close()
    val tout = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.util.zip.GZIPOutputStream(Files.newOutputStream(dir.resolve("b.tar.gz"))))
    val te = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("two.log")
    val b2 = log2.getBytes("UTF-8")
    te.setSize(b2.length.toLong)
    tout.putArchiveEntry(te); tout.write(b2); tout.closeArchiveEntry(); tout.close()
    val gz = new java.util.zip.GZIPOutputStream(Files.newOutputStream(dir.resolve("three.log.gz")))
    gz.write(log2.getBytes("UTF-8")); gz.close()

    val events = ArchiveIngest.read(spark, dir.toString).collect()
    assert(events.length == 4) // 2 from zip entry, 1 from tar, 1 from gz
    val byFile = events.groupBy(_.getString(1))
    assert(byFile.keySet == Set("one.log", "two.log", "three.log"))
    // multi-line continuation attached to the second event of one.log
    val one = byFile("one.log").sortBy(_.getInt(2))
    assert(one(1).getString(6) == " beta line\n  continuation")
    // ts parsed to the right epochs
    assert(one(0).getLong(4) == 1704067201000L)
    assert(byFile("two.log").head.getLong(4) == 1704067203000L)
  }

  test("entries() iterates multi-entry zips lazily with directory filtering") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("d/")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("d/x.log")); z.write("x".getBytes); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("d/y.log")); z.write("y".getBytes); z.closeEntry()
    z.close()
    val got = ArchiveIngest.entries("a.zip", bos.toByteArray).toList
    assert(got.map(_._1) == List("d/x.log", "d/y.log"))
    assert(got.map(e => new String(e._2)) == List("x", "y"))
  }
}

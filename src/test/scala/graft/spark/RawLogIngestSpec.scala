package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{ClpPipeline, RawLogIngest}

/** Raw log-file ingestion: timestamp-boundary event splitting (multi-line
  * stack traces), byte-exact reconstruction (ts re-spliced by pattern), and
  * the full pipeline over raw files via the Turn adapter. */
class RawLogIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val log1 =
    """2015-01-31T15:50:45.392 INFO starting service on port 8080
      |2015-01-31T15:50:45,393 WARN cache miss for key user_42
      |java.lang.RuntimeException: boom
      |    at com.example.Main.run(Main.java:42)
      |    at com.example.Main.main(Main.java:7)
      |2015-01-31T15:50:46.000 INFO recovered
      |""".stripMargin

  private val log2 =
    """#!/bin/bash preamble without any date
      |INFO [main] 2015-01-31 15:50:45,085 job started
      |localhost - - [01/Jan/2016:15:50:17 +0000] GET /health
      |""".stripMargin

  test("events split on timestamped lines; continuations attach") {
    val evs = RawLogIngest.splitEvents(log1)
    assert(evs.map(_.eventIdx) == Vector(0, 1, 2))
    assert(evs(1).text.linesIterator.size == 4) // WARN + exception + 2 frames
    assert(evs.forall(_.patternId >= 0))
    assert(evs(0).epochMs == 1422719445392L)
  }

  test("reconstruction is byte-exact per event and per file") {
    for (content <- Seq(log1, log2)) {
      val evs = RawLogIngest.splitEvents(content)
      val rebuilt = evs.map(RawLogIngest.reconstruct).mkString("\n")
      assert(rebuilt == content.stripSuffix("\n"))
    }
  }

  test("preamble without timestamp forms event 0 with no pattern") {
    val evs = RawLogIngest.splitEvents(log2)
    assert(evs.head.patternId == -1 && evs.head.text.startsWith("#!/bin/bash"))
    assert(evs(1).patternId >= 0 && evs(1).tsBegin == 12) // mid-line INFO [main]
  }

  test("raw files -> events -> full pipeline, decode byte-exact") {
    val dir = Files.createTempDirectory("graft-rawlog").toString
    Files.write(java.nio.file.Paths.get(dir, "svc-a.log"), log1.getBytes)
    Files.write(java.nio.file.Paths.get(dir, "svc-b.log"), log2.getBytes)

    val events = RawLogIngest.read(spark, dir)
    assert(events.count() == 6)
    // parallel across files: one source row (task) per file
    assert(events.select("file").distinct().count() == 2)

    val outDir = Files.createTempDirectory("graft-rawlog-out").toString
    val res = ClpPipeline.run(spark, RawLogIngest.asTurns(events),
      ClpPipeline.Config(outDir, maxSinks = 4, saltParts = 2))
    assert(res.rowsRouted == 6)
    assert(ClpPipeline.roundTripViolations(spark, RawLogIngest.asTurns(events), outDir).count() == 0)
  }
}

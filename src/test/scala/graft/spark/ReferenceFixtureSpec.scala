package graft.spark

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.Wildcard
import graft.functions.ClpFunctions._
import graft.pipeline.{ClpPipeline, RawLogIngest}
import graft.search.{ClpSearch, Extract}

/** End-to-end over the reference's OWN test fixtures (read in place, never
  * copied): the multiline/static-text/relative-timestamp log file its parser
  * suite ingests (components/core/tests/test_log_files/log.txt) and the
  * forward/reverse lexer token-case corpus its search suite queries
  * (components/core/tests/test_search_queries/easy.txt). The invariants are
  * the pipeline's own contracts — byte-exact split/reconstruct, search ≡
  * brute-force wildcard oracle — so no expected values are transcribed from
  * the reference's code. */
class ReferenceFixtureSpec extends SparkSpecBase {

  private val logFixture =
    Paths.get("/root/reference/components/core/tests/test_log_files/log.txt")
  private val queryFixture = Paths.get(
    "/root/reference/components/core/tests/test_search_queries/easy.txt")

  private def readFixture(p: java.nio.file.Path): String = {
    assume(Files.isReadable(p), s"reference fixture $p not present")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
  }

  test("reference log.txt: timestamp-boundary split reconstructs byte-exact") {
    val content = readFixture(logFixture)
    val events = RawLogIngest.splitEvents(content)
    // the parser suite's boundary semantics: every '2016-05-08 ...' line
    // starts an event; 'is multiline' and the trailing relative-timestamp
    // line (no absolute pattern) are continuations
    assert(events.count(_.patternId >= 0) == 6)
    assert(events.exists(_.text.contains("\nis multiline")))
    val rejoined = events.map(RawLogIngest.reconstruct).mkString("\n") +
      (if (content.endsWith("\n")) "\n" else "")
    assert(rejoined == content, "split → reconstruct must be byte-exact")
  }

  test("reference log.txt: full pipeline e2e — search oracle + byte-exact extract") {
    val content = readFixture(logFixture)
    val dir = Files.createTempDirectory("graft-ref-log").toString
    Files.write(Paths.get(dir, "log.txt"),
      content.getBytes(StandardCharsets.UTF_8))
    val turns = RawLogIngest.asTurns(RawLogIngest.read(spark, dir)).cache()
    val out = Files.createTempDirectory("graft-ref-arch").toString
    ClpPipeline.run(spark, turns, ClpPipeline.Config(out, maxSinks = 2, saltParts = 2))
    val engine = new ClpSearch(spark, out)
    def oracle(q: String): Set[Int] =
      turns.filter(wildcard_match(col("text"), lit(Wildcard.cleanUp(q)), lit(true)))
        .select("turn_idx").collect().map(_.getInt(0)).toSet
    def got(q: String): Set[Int] =
      engine.search(q).select("turn_idx").collect().map(_.getInt(0)).toSet
    // dict vars, float vars, int vars, static text, a backslashed path
    for (q <- Seq("*MyDog123*", "* 1.9 GB *", "*statictext123*", "*123.123*",
        "*Static Text*", "*APet4123\\\\test.txt*", "*no such token here*")) {
      val exp = oracle(q)
      assert(got(q) == exp, s"fixture search mismatch for '$q'")
      if (!q.contains("no such")) assert(exp.nonEmpty, s"weak fixture query '$q'")
    }
    // O3 on the fixture: ordered reconstruction returns every split event's
    // text byte-exact
    val extracted = Extract(spark, out).select("turn_idx", "text")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val expected = turns.select("turn_idx", "text")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(extracted == expected)
  }

  test("reference easy.txt: lexer token cases round-trip and search exactly") {
    import spark.implicits._
    val lines = readFixture(queryFixture).split("\n").toSeq
      .filter(_.nonEmpty)
    val t0 = new java.sql.Timestamp(1704067200000L)
    val turns = lines.zipWithIndex.map { case (l, i) =>
      graft.pipeline.Turn(s"c$i", i, "log", l, "raw", t0)
    }.toDF().cache()
    val out = Files.createTempDirectory("graft-ref-easy").toString
    ClpPipeline.run(spark, turns, ClpPipeline.Config(out, maxSinks = 2, saltParts = 2))
    // encode → decode byte-exact on every token case (P4/P5 on the
    // reference's own nastiest variables: timestamps-as-text, hex-ish ids,
    // trailing '=', mixed alnum)
    val bad = turns
      .withColumn("enc", clp_encode(col("text")))
      .withColumn("rt", clp_decode(col("enc.logtype"),
        col("enc.encoded_vars"), col("enc.dict_vars")))
      .filter(col("rt") =!= col("text"))
      .count()
    assert(bad == 0, "clp encode/decode must round-trip every lexer case")
    // each line, queried verbatim, matches exactly the rows the brute-force
    // wildcard oracle says (tokens that embed in other lines included)
    val engine = new ClpSearch(spark, out)
    for (l <- lines) {
      val exp = turns
        .filter(wildcard_match(col("text"), lit(Wildcard.cleanUp(l)), lit(true)))
        .select("conv_id").as[String].collect().toSet
      val got = engine.search(l).select("conv_id").as[String].collect().toSet
      assert(got == exp, s"fixture token query mismatch for '$l'")
      assert(exp.nonEmpty, s"weak fixture token '$l'")
    }
  }
}

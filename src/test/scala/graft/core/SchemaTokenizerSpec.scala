package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Schema (grok/regex) tokenizer, shaped on the reference fixture
  * components/core/tests/test_schema_files/real_schema.txt. */
class SchemaTokenizerSpec extends AnyFunSuite {

  private val schemaText =
    """// Delimiters
      |delimiters: \s\t\r\n
      |
      |timestamp:[0-9]{4}\-[0-9]{2}\-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}[,\.][0-9]{0,3}
      |int:\-{0,1}[0-9]+
      |float:\-{0,1}[0-9]+\.[0-9]+
      |hex:[a-fA-F]+
      |hasNumber:[^ \r\n]*\d[^ \r\n]*
      |equals:=[^ \r\n]*[a-zA-Z0-9][^ \r\n]*
      |""".stripMargin

  private val schema = TokenizerSchema.parse(schemaText)

  test("schema-file parsing") {
    assert(schema.delimiters == " \t\r\n")
    assert(schema.variables.map(_._1) ==
      Seq("timestamp", "int", "float", "hex", "hasNumber", "equals"))
  }

  test("classification follows schema priority order") {
    val msg = "2016-05-08 07:34:05.251 job 42 ratio 0.75 id deadbeef code a1b2 =opt"
    val e = SchemaTokenizer.encode(msg, schema)
    // timestamp prefix → dict var; 42 → int; 0.75 → float; deadbeef → hex
    // (dict); a1b2 → hasNumber (dict); =opt → equals (dict)
    val (ints, floats, dicts) = ClpEncoding.placeholderCounts(e.logtype)
    assert(ints == 1 && floats == 1)
    assert(e.dictVars.toSeq == Seq("2016-05-08 07:34:05.251", "deadbeef", "a1b2", "=opt"))
    assert(e.encodedVars.length == 2)
    assert(ClpEncoding.decode(e.logtype, e.encodedVars, e.dictVars) == msg)
  }

  test("unmatched tokens stay constant text") {
    val e = SchemaTokenizer.encode("plain words only", schema)
    assert(e.dictVars.isEmpty && e.encodedVars.isEmpty)
    assert(e.logtype == "plain words only")
  }

  test("round-trip property over the synthetic corpus") {
    for (i <- 0 until 2000) {
      val msg = graft.pipeline.TranscriptGen.renderText(i % 50, i.toLong * 31)
      val e = SchemaTokenizer.encode(msg, schema)
      assert(ClpEncoding.decode(e.logtype, e.encodedVars, e.dictVars) == msg, msg)
    }
  }
}

/** Format-preserving timestamp patterns (P2/P3). */
class TimestampPatternsSpec extends AnyFunSuite {
  import TimestampPatterns._

  test("parse + byte-exact format round-trip for every built-in pattern") {
    val samples = Seq(
      "2015-01-31T15:50:45.392", "2015-01-31T15:50:45,392",
      "2015-01-31 15:50:45.392", "2015-01-31 15:50:45,392",
      "2015/01/31T15:50:45.123", "2015/01/31 15:50:45.123",
      "[2015-01-31 15:50:45,085]", "<<<2016-11-10 03:02:29:936",
      "01 Jan 2016 15:50:17,085", "2015-01-31T15:50:45",
      "2015-01-31 15:50:45", "2015/01/31 15:50:45",
      "[20170106-16:56:41]", "15/01/31 15:50:45", "150131  9:50:45",
      "2015/01/31T15:50:45,123", "[2015-01-31T15:50:45",
      "Jan 01, 2016  3:50:17 PM", "January 31, 2015 15:50",
      "Thu Jan  1 15:50:45 2015", // weekday re-derived from the date on format
      "Jan 21 11:56:42", "01-21 11:56:42.392", // year-less (imprecise) patterns
      "916321") // relative timestamp in ms (%#3)
    samples.foreach { s =>
      val got = search(s)
      assert(got.isDefined, s"no pattern matched '$s'")
      val (id, epoch, len) = got.get
      assert(len == s.length)
      assert(format(id, epoch) == s, s"round-trip failed for '$s'")
    }
  }

  test("mid-line timestamps (spaces-before prefixes) round-trip their span") {
    val samples = Seq(
      "INFO [main] 2015-01-31 15:50:45,085 starting service",
      "Start-Date: 2015-01-31  15:50:45",
      "E [31/Jan/2015:15:50:45 +0000]",
      "localhost - - [01/Jan/2016:15:50:17 +0000]",
      "192.168.4.5 - - [01/01/2016:15:50:17 +0000]",
      "Started POST \"/api/v3/allowed\" for 127.0.0.1 at 2017-06-18 00:20:44",
      "update-alternatives 2015-01-31 15:50:45",
      "ERROR: apport (pid 4557) Thu Jan  1 15:50:45 2015")
    samples.foreach { s =>
      val m = searchFull(s)
      assert(m.isDefined, s"no pattern matched '$s'")
      val TsMatch(id, epoch, begin, end) = m.get
      assert(begin > 0, s"expected mid-line match for '$s'")
      assert(format(id, epoch) == s.substring(begin, end), s"span round-trip failed for '$s'")
    }
  }

  test("parse rejects malformed inputs (modulo the reference's relative-ts fallback)") {
    assert(search("not a timestamp").isEmpty)
    // digit-leading lines fall through to %#3 (relative ms) exactly like the
    // reference's imprecise catch-all — the span is just the leading digits
    val Some(m13) = searchFull("2015-13-31 15:50:45") // month 13: no date pattern
    assert(Patterns(m13.patternId).fmt == "%#3" && m13.end == 4 && m13.epochMs == 2015L)
    val Some(h25) = searchFull("2015-01-31 25:50:45") // hour 25: no date pattern
    assert(Patterns(h25.patternId).fmt == "%#3" && h25.end == 4)
  }

  test("round-trip-unsafe timestamps are rejected by the date patterns") {
    // pre-1970 years, leap seconds, and impossible days-of-month have no
    // epoch-ms representation that formats back byte-exactly — matching them
    // would silently rewrite the line on reconstruction. They fall through
    // to the %#3 digit fallback (same as month-13 above), which DOES
    // round-trip its own span
    for (s <- Seq("1969-12-31 23:59:59", "2015-06-30 23:59:60",
        "2015-02-31 10:00:00", "2015-04-31 10:00:00")) {
      val Some(m) = searchFull(s)
      assert(Patterns(m.patternId).fmt == "%#3", s"date pattern wrongly matched '$s'")
      assert(format(m.patternId, m.epochMs) == s.substring(m.begin, m.end))
    }
    // the valid neighbors still match full date patterns
    assert(search("1970-01-01 00:00:00").exists(_._2 == 0L))
    assert(search("2016-02-29 23:59:59").isDefined) // leap-year Feb 29
    assert(search("2015-06-30 23:59:59").isDefined)
  }

  test("epoch math agrees with java.time") {
    for (s <- Seq("2015-01-31 15:50:45", "2024-02-29 00:00:00", "1999-12-31 23:59:59")) {
      val Some((_, epoch, _)) = search(s)
      val exp = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      assert(epoch == exp, s)
    }
  }

  test("matched prefix with trailing message content") {
    val Some((id, epoch, len)) = search("2016-05-08 07:34:05.251 MyDog123 ate")
    assert(format(id, epoch) == "2016-05-08 07:34:05.251")
    assert(len == "2016-05-08 07:34:05.251".length)
  }
}

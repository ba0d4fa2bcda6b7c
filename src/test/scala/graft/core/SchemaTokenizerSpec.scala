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
      "[20170106-16:56:41]", "15/01/31 15:50:45", "150131  9:50:45")
    samples.foreach { s =>
      val got = search(s)
      assert(got.isDefined, s"no pattern matched '$s'")
      val (id, epoch, len) = got.get
      assert(len == s.length)
      assert(format(id, epoch) == s, s"round-trip failed for '$s'")
    }
  }

  test("parse rejects malformed inputs") {
    assert(search("not a timestamp").isEmpty)
    assert(search("2015-13-31 15:50:45").isEmpty) // month 13
    assert(search("2015-01-31 25:50:45").isEmpty) // hour 25
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

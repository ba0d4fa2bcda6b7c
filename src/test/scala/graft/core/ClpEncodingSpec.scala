package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Unit vectors mirrored from the reference's Catch2 suites
  * (components/core/tests/test-EncodedVariableInterpreter.cpp,
  * test-ir_parsing.cpp) plus ScalaCheck round-trip properties. */
class ClpEncodingSpec extends AnyFunSuite {
  import ClpEncoding._
  import GenCheck.forAll

  test("integer representability vectors") {
    assert(tryEncodeInt("0").contains(0L))
    assert(tryEncodeInt("-1").contains(-1L))
    assert(tryEncodeInt("1").contains(1L))
    assert(tryEncodeInt("9223372036854775807").contains(Long.MaxValue))
    assert(tryEncodeInt("-9223372036854775808").contains(Long.MinValue))
    for (bad <- Seq("", "a", "-", "+", "-a", "+a", "--", "++", " 1", "- 1", "1 ",
                    "01", "007", "+1", "-0", "9223372036854775808", "1.0"))
      assert(tryEncodeInt(bad).isEmpty, s"'$bad' must not be an int var")
  }

  test("float representability + byte-exact round-trip vectors") {
    for (good <- Seq("0.0", "-1.0", "1.0", ".1", "-00.00", "-999999999999999.9",
                     "-.9999999999999999", ".9999999999999999", "1.500", "3.14159"))
      assert(tryEncodeFloat(good).map(decodeFloat).contains(good), s"'$good' must round-trip")
    for (bad <- Seq("", "a", "-", "+", "-a", "+a", "--", "++", ".", "1.", " 1.0",
                    "- 1.0", "1.0 ", "+1.0", "1.0f", "1.0F", "1.0l", "1.0L",
                    "18446744073709551615", "1.2.3", "--1.0", "123456789012345678.9"))
      assert(tryEncodeFloat(bad).isEmpty, s"'$bad' must not be a float var")
    // trailing zeros preserved: 1.500 != 1.5 after decode
    assert(tryEncodeFloat("1.500").map(decodeFloat).contains("1.500"))
    assert(tryEncodeFloat("1.5").map(decodeFloat).contains("1.5"))
  }

  test("tokenizer classification (ir/parsing.cpp rules)") {
    def varsOf(msg: String): Seq[String] = {
      val e = encode(msg)
      val all = scala.collection.mutable.ArrayBuffer.empty[String]
      var encIx = 0; var dictIx = 0; var i = 0
      while (i < e.logtype.length) {
        val c = e.logtype.charAt(i)
        if (c == EscapeChar) i += 2
        else {
          if (c == IntPlaceholder) { all += e.encodedVars(encIx).toString; encIx += 1 }
          else if (c == FloatPlaceholder) { all += decodeFloat(e.encodedVars(encIx)); encIx += 1 }
          else if (c == DictPlaceholder) { all += e.dictVars(dictIx); dictIx += 1 }
          i += 1
        }
      }
      all.toSeq
    }
    // contains a digit => variable
    assert(varsOf("went to MyDog123") == Seq("MyDog123"))
    // '='-prefixed with alphabet => variable
    assert(varsOf("status=failed") == Seq("failed"))
    // multi-digit hex => variable
    assert(varsOf("id deadBEEF here") == Seq("deadBEEF"))
    // plain word, not preceded by '=' and no digit/hex => constant
    assert(varsOf("hello world").isEmpty)
    // single hex letter is not a variable
    assert(varsOf("grade a given").isEmpty)
    // mixed message: '/' is a delimiter, so path segments split; only "x7"
    // (contains a digit) is a variable within the path
    assert(varsOf("job 12 took 0.345 s at path=/usr/bin/x7 rc=-3") ==
      Seq("12", "0.345", "x7", "-3"))
    // '='-adjacency: a token right after '=' with any letter is a variable
    assert(varsOf("a=b") == Seq("b"))
    assert(varsOf("k=value7 k2=word") == Seq("value7", "k2", "word"))
  }

  test("logtype escaping of placeholder bytes and backslash") {
    val raw = "weird \u0011\u0012\u0013 bytes C:\\dir\\file7"
    val e = encode(raw)
    assert(decode(e.logtype, e.encodedVars, e.dictVars) == raw)
    // the escape byte precedes each in-band special char in the template
    assert(e.logtype.contains("" + EscapeChar + IntPlaceholder))
  }

  test("round-trip on reference-fixture-shaped messages") {
    val msgs = Seq(
      "2016-05-08 07:34:05.251 MyDog123 APet4123\\test.txt",
      " INFO Task task_12 assigned to container: [NodeAddress:172.128.0.1:8040]",
      "job 3 flushed 1024 bytes in 0.125 s rc=0",
      "checksum 231ACDFE21 verified for asd=asd123asd",
      "open file /var/log/app-2024.01.log size=4096",
      "latency p99=1.500 ms count=007 id=0x7F",
      "no variables here at all",
      "",
      "value: -9223372036854775808 and overflow 92233720368547758079",
      "unicode héllo wörld 42 done",
    )
    for (m <- msgs) {
      val e = encode(m)
      assert(decode(e.logtype, e.encodedVars, e.dictVars) == m, s"round-trip failed for '$m'")
    }
  }

  test("property: decode(encode(s)) == s for arbitrary strings") {
    val asciiGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '=', '.', '-', '+', '_', '/', ':', '[', ']', ','),
      1 -> Gen.oneOf('\\', '\u0011', '\u0012', '\u0013', '*', '?'),
      1 -> Gen.choose(32.toChar, 126.toChar),
    )).map(_.mkString)
    forAll(asciiGen) { s =>
      val e = encode(s)
      assert(decode(e.logtype, e.encodedVars, e.dictVars) == s)
    }
    forAll(Gen.asciiPrintableStr) { s =>
      val e = encode(s)
      assert(decode(e.logtype, e.encodedVars, e.dictVars) == s)
    }
  }

  test("property: numeric tokens round-trip to identical text") {
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { n =>
      val s = s"val $n end"
      val e = encode(s)
      assert(decode(e.logtype, e.encodedVars, e.dictVars) == s)
    }
    forAll(Gen.choose(0, 999999), Gen.choose(0, 6)) { (mantissa: Int, scale: Int) =>
      val s = s"x ${mantissa.toString.take(9)}.${"0" * scale}5 y"
      val e = encode(s)
      assert(decode(e.logtype, e.encodedVars, e.dictVars) == s)
    }
  }

  test("mergeVars produces one int64 per placeholder in CLP order") {
    val e = encode("job 12 took 0.5 s at path=/x7 rc=-3")
    val (i, f, d) = placeholderCounts(e.logtype)
    assert(i == 2 && f == 1 && d == 1)
    val dictIds = e.dictVars.indices.map(_.toLong + 1000L).toArray
    val merged = mergeVars(e.logtype, e.encodedVars, dictIds)
    assert(merged.length == 4)
    assert(merged(0) == 12L)          // int 12
    assert(merged(2) == 1000L)        // dict id
    assert(merged(3) == -3L)          // int -3
  }
}

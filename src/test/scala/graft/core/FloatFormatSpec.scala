package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Format-preserving floats (clp_s FormattedFloat/DictionaryFloat rules). */
class FloatFormatSpec extends AnyFunSuite {
  import GenCheck.forAll

  private val formatted = Seq(
    "1.5", "1.500", "0.25", "-3.75", "123.450", "0.0001", "-0.50",
    "1e9", "2.5e-4", "1.5E+03", "7.25e02", "9.999e-10", "3.14159265358979",
    // the reference's end-to-end corner cases
    // (tests/test_log_files/test_valid_formatted_float.jsonl): zeros with
    // format, negative zero, zero-mantissa scientific, subnormal/max
    // binary64, long leading-zero forms, correctly-rounded 17th digit
    "-0.00", "0.000E0", "0E0", "-0E+0000", "1.000E-0", "1.000E-00",
    "0.0000000000000000E0000", "-0.0000000000000000E0000",
    "4.9406564584124654E-324", "1.7976931348623157E308",
    "0.00000000000000000000000000001234567891234500",
    "0.10000000000000001")

  test("FormattedFloat literals restore byte-exactly from (double, format)") {
    formatted.foreach { s =>
      val enc = FloatFormat.encode(s)
      assert(enc.isDefined, s"'$s' should be format-encodable")
      val (v, f) = enc.get
      assert(FloatFormat.restore(v, f) == s, s"'$s' restore mismatch")
    }
  }

  test("unsupported shapes fall to the dictionary (encode refuses)") {
    // leading zeros, non-normalized mantissa, >17 significant digits, huge
    // exponents, junk — and the reference's "invalid formatted float"
    // classes (test_invalid_formatted_float.jsonl): literals that are not
    // the correctly-rounded decimal of their own nearest binary64 at their
    // own precision (18-digit trailing-zero forms, zeros-padded 17th
    // digit, non-754 scientific forms, zero mantissa with a non-zero
    // exponent)
    for (s <- Seq("00.5", "15e2", "1.23456789012345678901", "1e99999", "0e5",
        "0.00000000000000000", "123456789.123456789", "123456789.123456700",
        "1.23456789123456700E8", "0.10000000000000000",
        "1.2345678912345679e+13", "+1.5", "1.", ".5", "120", "1E"))
      assert(FloatFormat.encode(s).isEmpty, s"'$s' should NOT encode")
  }

  test("retain mode types floats as Formatted vs Dictionary (JsonParser rule)") {
    val leaves = JsonShape.typedLeaves(
      """{"a":1.500,"b":1.23456789012345678901,"c":2.5e-4,"d":3.5}""", retainFloatFormat = true)
    assert(leaves.map(l => l.path -> l.nodeType) == List(
      "a" -> "FormattedFloat", "b" -> "DictionaryFloat",
      "c" -> "FormattedFloat", "d" -> "FormattedFloat"))
    // default mode unchanged (schema descriptors stay stable)
    assert(JsonShape.leaves("""{"a":1.500}""") == List("a" -> "Float"))
  }

  test("kv-IR carries FormattedFloat as (double, word) and DictionaryFloat as text") {
    val ev = JsonShape.typedLeaves(
      """{"a":1.500,"b":1.23456789012345678901,"m":"x y z"}""", retainFloatFormat = true)
    assert(KvIr.deserialize(KvIr.serialize(Seq(ev))) == Vector(ev))
  }

  test("property: shortest double representations always format-encode") {
    // the reference's fuzz gate (test-FloatFormatEncoding.cpp:36-60) in
    // Java clothing: machine-formatted floats — here the shortest
    // round-trip form, which is by construction the correctly-rounded
    // decimal of its double at its own precision — must always encode and
    // restore byte-exactly, across the full bit space including
    // subnormals, negative zero, and extreme exponents
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), n = 2000) { bits =>
      val v = java.lang.Double.longBitsToDouble(bits)
      if (java.lang.Double.isFinite(v)) {
        val s = v.toString
        // JDK 17's legacy Double.toString occasionally emits MORE than 17
        // digits (non-minimal output, fixed by JDK-4511638 in 19); those
        // overshoot the reference's significant-digit cap and must fall to
        // the dictionary instead — also asserted
        val sig = math.max(
          s.takeWhile(c => c != 'e' && c != 'E')
            .filter(_.isDigit).dropWhile(_ == '0').length, 1)
        val enc = FloatFormat.encode(s)
        if (sig <= 17) {
          assert(enc.isDefined, s"'$s' must encode")
          assert(FloatFormat.restore(enc.get._1, enc.get._2) == s, s"'$s'")
        } else assert(enc.isEmpty, s"'$s' exceeds 17 significant digits")
      }
    }
  }

  test("property: doubles rendered with fixed fraction digits round-trip") {
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue), Gen.choose(1, 6)) { (m, frac) =>
      val s = new java.math.BigDecimal(java.math.BigInteger.valueOf(m.toLong), frac)
        .setScale(frac).toPlainString
      val enc = FloatFormat.encode(s)
      assert(enc.isDefined && FloatFormat.restore(enc.get._1, enc.get._2) == s, s"'$s'")
    }
  }
}

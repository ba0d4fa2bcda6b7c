package graft.core

/**
 * Format-preserving float encoding — the clp_s FormattedFloat capability
 * re-expressed (components/core/src/clp_s/FloatFormatEncoding.hpp:14-45,
 * FloatFormatEncoding.cpp:136-332; typing rule JsonParser.cpp:255-283): a
 * float literal is stored as (double, 16-bit format word) iff rendering the
 * double back through the format reproduces the literal byte-for-byte;
 * otherwise the caller falls back to the string dictionary
 * (DictionaryFloat). The word layout is our own (the archive format is
 * ours) with the same information content as the reference's: the mantissa
 * digits are NOT stored — only their significant count is — and [[restore]]
 * re-derives them from the double via correctly-rounded scientific
 * rendering. That is what lets arbitrarily long leading-zero forms
 * ("0.0…0123", 40+ characters) fit a 5-bit field: the zeros are implied by
 * the double's magnitude.
 *
 * {{{
 *   [15:14] scientific notation: 0 none, 1 'e', 2 'E'
 *   [13:12] exponent sign:       0 none, 1 '+', 2 '-'
 *   [11:10] exponent digit count - 1 (sci only)
 *   [9:5]   significant digit count - 1 (1..17, counted from the first
 *           non-zero digit; an all-zero mantissa counts every digit)
 *   [4:0]   unused
 * }}}
 */
object FloatFormat {

  /** cMaxNumSignificantDigits (FloatFormatEncoding.hpp:39) — binary64
    * needs at most 17 decimal digits. */
  private val MaxSignificantDigits = 17

  /** Derives (value, format) for a float literal; None ⇒ DictionaryFloat.
    * Includes the reference's round-trip gate: encode succeeds only if
    * [[restore]] reproduces the literal exactly (so a literal that is not
    * the correctly-rounded decimal form of its own nearest double at its
    * own precision — e.g. 18 significant digits of a 17-digit value —
    * falls out here, exactly like the "invalid formatted float" corpus). */
  def encode(s: String): Option[(Double, Int)] =
    describe(s).flatMap { f =>
      val v = java.lang.Double.parseDouble(s)
      if (java.lang.Double.isFinite(v) && restore(v, f) == s) Some((v, f))
      else None
    }

  /** Structural description of the literal; None when it doesn't fit the
    * field widths or the shapes the scheme can re-derive (>17 significant
    * digits, >4 exponent digits, prefix zeros, a multi-digit scientific
    * integer part). Acceptance is decided by [[encode]]'s round-trip gate
    * on top of this — mirrors get_float_encoding
    * (FloatFormatEncoding.cpp:136-262). */
  private def describe(s: String): Option[Int] = {
    val n = s.length
    if (n == 0 || s.charAt(0) == '+') return None
    val first = if (s.charAt(0) == '-') 1 else 0
    if (first >= n) return None
    val dot = s.indexOf('.')
    var expPos = s.indexWhere(c => c == 'e' || c == 'E')
    var word = 0
    if (expPos >= 0) {
      // scientific: exactly one mantissa digit before the '.' (when present)
      if (dot >= 0 && dot != first + 1) return None
      word |= (if (s.charAt(expPos) == 'e') 1 else 2) << 14
      var i = expPos + 1
      if (i >= n) return None
      s.charAt(i) match {
        case '+' => word |= 1 << 12; i += 1
        case '-' => word |= 2 << 12; i += 1
        case _ => ()
      }
      val expDigits = n - i
      if (expDigits < 1 || expDigits > 4) return None
      while (i < n) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') return None
        i += 1
      }
      word |= (expDigits - 1) << 10
    } else {
      expPos = n
      if (dot < 0) return None // plain integer — not a float literal
    }
    // mantissa region must be plain decimal digits + at most the one '.'
    var j = first
    var dots = 0
    if (j >= expPos) return None
    while (j < expPos) {
      val c = s.charAt(j)
      if (c == '.') dots += 1
      else if (c < '0' || c > '9') return None
      j += 1
    }
    if (dots > 1 || dot == expPos - 1 || dot == first) return None
    // no prefix zeros ("0N.…"): a leading '0' must be followed by '.' / end
    if (s.charAt(first) == '0' && first + 1 < expPos && s.charAt(first + 1) != '.')
      return None
    // first significant digit: first non-zero, or the leading zero itself
    // when every digit is zero (then the count spans the whole zero run)
    var firstSig = first
    if (s.charAt(first) == '0' && dot >= 0) {
      var i = dot + 1
      var found = false
      while (i < expPos && !found) {
        if (s.charAt(i) != '0') { firstSig = i; found = true }
        i += 1
      }
    }
    var sig = expPos - firstSig
    if (dot >= 0 && firstSig < dot && dot < expPos) sig -= 1
    if (sig < 1 || sig > MaxSignificantDigits) return None
    word |= (sig - 1) << 5
    Some(word)
  }

  /** Renders `value` through the format word: correctly-rounded scientific
    * rendering at the stored significant-digit count, then the stored
    * surface shape — sci marker case, exponent sign char (applied verbatim,
    * like the reference: a mismatched stored sign produces a string the
    * encode gate rejects), exponent digit padding/leading-zero trimming, or
    * plain-decimal point placement (restore_encoded_float,
    * FloatFormatEncoding.cpp:265-332). */
  def restore(value: Double, fmt: Int): String = {
    val sci = (fmt >> 14) & 0x3
    val expSignFlag = (fmt >> 12) & 0x3
    val expDigits = ((fmt >> 10) & 0x3) + 1
    val sig = ((fmt >> 5) & 0x1f) + 1
    val (mant, negExp, rawDigits) = sciParts(value, sig)
    if (sci == 0) return scientificToDecimal(mant, negExp, rawDigits)
    val e = if (sci == 1) "e" else "E"
    val signOut = expSignFlag match { case 1 => "+"; case 2 => "-"; case _ => "" }
    val digits =
      if (rawDigits.length > expDigits) trimLeadingZeros(rawDigits, expDigits)
      else ("0" * (expDigits - rawDigits.length)) + rawDigits
    s"$mant$e$signOut$digits"
  }

  /** Correctly-rounded scientific parts of `value` at `sig` significant
    * digits — (signed mantissa in [1,10) with exactly sig-1 fraction
    * digits, exponent sign, exponent digits, no padding). The reference
    * gets this from iostreams' `%.*e` (the exact binary expansion rounded
    * half-even); Java's Formatter pads the SHORTEST representation with
    * zeros instead of rounding the exact expansion (visible on subnormals
    * and 17th-digit forms), so this goes through exact BigDecimal. The
    * sign of -0.0 survives via the raw bits. */
  private def sciParts(value: Double, sig: Int): (String, Boolean, String) = {
    val neg = java.lang.Double.doubleToRawLongBits(value) < 0
    val prefix = if (neg) "-" else ""
    if (value == 0.0) {
      val m = if (sig == 1) "0" else "0." + ("0" * (sig - 1))
      (prefix + m, false, "0")
    } else {
      val exact = new java.math.BigDecimal(math.abs(value))
      val rounded = exact.round(
        new java.math.MathContext(sig, java.math.RoundingMode.HALF_EVEN))
      val exp10 = rounded.precision - rounded.scale - 1
      val m = rounded.movePointLeft(exp10).setScale(sig - 1).toPlainString
      (prefix + m, exp10 < 0, math.abs(exp10).toString)
    }
  }

  /** Drop leading zeros until `target` digits remain, stopping at the first
    * non-zero (trim_leading_zeros, FloatFormatEncoding.cpp:73-90). */
  private def trimLeadingZeros(d: String, target: Int): String = {
    var i = 0
    while (d.length - i > target && d.charAt(i) == '0') i += 1
    d.substring(i)
  }

  /** Plain-decimal surface from the rounded scientific parts — point moved
    * by the exponent, leading/trailing zeros regenerated
    * (scientific_to_decimal, FloatFormatEncoding.cpp:92-133). */
  private def scientificToDecimal(mant: String, negExp: Boolean,
                                  expDigitsStr: String): String = {
    val neg = mant.startsWith("-")
    val m = if (neg) mant.substring(1) else mant
    val exp = (if (negExp) -1 else 1) * Integer.parseInt(expDigitsStr)
    val dp = m.indexOf('.')
    val digits = if (dp >= 0) m.substring(0, dp) + m.substring(dp + 1) else m
    val decimalPos = if (dp < 0) exp + 1 else dp + exp
    val body =
      if (decimalPos <= 0) "0." + ("0" * -decimalPos) + digits
      else if (decimalPos < digits.length)
        digits.substring(0, decimalPos) + "." + digits.substring(decimalPos)
      else digits + ("0" * (decimalPos - digits.length))
    (if (neg) "-" else "") + body
  }
}

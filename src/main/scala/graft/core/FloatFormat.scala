package graft.core

/**
 * Format-preserving float encoding — the clp_s FormattedFloat capability
 * re-expressed (components/core/src/clp_s/FloatFormatEncoding.hpp:14-45,
 * JsonParser.cpp:255-283): a float literal is stored as (double, 16-bit
 * format word) iff rendering the double back through the format reproduces
 * the literal byte-for-byte; otherwise the caller falls back to the string
 * dictionary (DictionaryFloat). The word layout is our own (the archive
 * format is ours), same information content as the reference's:
 *
 * {{{
 *   [15:14] scientific notation: 0 none, 1 'e', 2 'E'
 *   [13:12] exponent sign:       0 none, 1 '+', 2 '-'
 *   [11:10] exponent digit count - 1 (sci only)
 *   [9]     has decimal point
 *   [4:0]   fraction digit count (after the point)
 * }}}
 */
object FloatFormat {

  /** Derives (value, format) for a float literal; None ⇒ DictionaryFloat.
    * Includes the reference's round-trip gate: encode succeeds only if
    * [[restore]] reproduces the literal exactly. */
  def encode(s: String): Option[(Double, Int)] = {
    val fmt = describe(s)
    fmt.flatMap { f =>
      val v = s.toDouble
      if (java.lang.Double.isFinite(v) && restore(v, f) == s) Some((v, f)) else None
    }
  }

  /** Structural description of the literal; None when it doesn't fit the
    * field widths (e.g. >31 fraction digits, >4 exponent digits). */
  private def describe(s: String): Option[Int] = {
    val n = s.length
    var i = 0
    if (i < n && s.charAt(i) == '-') i += 1
    val intStart = i
    while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
    if (i == intStart) return None // no integer digits
    var hasPoint = 0
    var fracDigits = 0
    if (i < n && s.charAt(i) == '.') {
      hasPoint = 1
      i += 1
      val fs = i
      while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
      fracDigits = i - fs
      if (fracDigits == 0 || fracDigits > 31) return None
    }
    var sci = 0
    var expSign = 0
    var expDigits = 0
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      sci = if (s.charAt(i) == 'e') 1 else 2
      i += 1
      if (i < n && s.charAt(i) == '+') { expSign = 1; i += 1 }
      else if (i < n && s.charAt(i) == '-') { expSign = 2; i += 1 }
      val es = i
      while (i < n && { val c = s.charAt(i); c >= '0' && c <= '9' }) i += 1
      expDigits = i - es
      if (expDigits == 0 || expDigits > 4) return None
    }
    if (i != n) return None
    if (sci == 0 && hasPoint == 0) return None // plain integer — not a float
    Some((sci << 14) | (expSign << 12) | (math.max(expDigits - 1, 0) << 10) |
      (hasPoint << 9) | fracDigits)
  }

  /** Renders `value` through the format word. */
  def restore(value: Double, fmt: Int): String = {
    val sci = (fmt >> 14) & 0x3
    val expSign = (fmt >> 12) & 0x3
    val expDigits = ((fmt >> 10) & 0x3) + 1
    val hasPoint = (fmt >> 9) & 0x1
    val fracDigits = fmt & 0x1f
    val bd = java.math.BigDecimal.valueOf(value)
    if (sci == 0) {
      bd.setScale(fracDigits, java.math.RoundingMode.HALF_UP).toPlainString
    } else {
      // normalized mantissa in [1, 10): exponent = digits left of the point - 1
      val unscaledDigits = bd.unscaledValue.abs.toString.length
      val exp10 = unscaledDigits - bd.scale - 1
      val mantissa = bd.movePointLeft(exp10)
        .setScale(fracDigits, java.math.RoundingMode.HALF_UP).toPlainString
      val m = if (hasPoint == 0 && fracDigits == 0 && mantissa.contains('.'))
        mantissa.substring(0, mantissa.indexOf('.')) else mantissa
      val e = if (sci == 1) "e" else "E"
      val sign = expSign match { case 1 => "+"; case 2 => "-"; case _ => "" }
      val absExp = math.abs(exp10)
      val expStr = absExp.toString.reverse.padTo(expDigits, '0').reverse.mkString
      // a stored '-' sign must agree with the actual exponent sign; when it
      // doesn't, the rendered form differs from the literal and the encode
      // round-trip gate rejects it
      val renderedSign = if (exp10 < 0) "-" else sign
      s"$m$e$renderedSign$expStr"
    }
  }
}

package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * CLP-style lossless log encoding: splits a message into
 *   - a log-type template (constant text with in-band placeholder bytes),
 *   - dictionary variables (non-numeric tokens, kept as strings until global ID assignment),
 *   - encoded variables (ints and packed decimal floats as 64-bit values),
 * such that `decode(logtype, encodedVars, dictVars) == message` byte-for-byte.
 *
 * Semantics re-expressed from the reference (y-scope CLP):
 *   - tokenizer rules: components/core/src/clp/ir/parsing.cpp:20-88, parsing.hpp:45-58
 *   - int/float representability + float bit packing:
 *     components/core/src/clp/EncodedVariableInterpreter.cpp:24-197
 *   - logtype placeholder bytes + escaping: components/core/src/clp/ir/types.hpp:11-16,
 *     components/core/src/clp/ir/parsing.inc (append_constant_to_logtype),
 *     components/core/src/clp/LogTypeDictionaryEntry.cpp:65-98
 *   - decode: components/core/src/clp/EncodedVariableInterpreter.hpp:379-453
 */
object ClpEncoding {

  /** In-band placeholder bytes (valid single-byte codepoints, UTF-8 safe). */
  final val IntPlaceholder: Char = 0x11.toChar
  final val DictPlaceholder: Char = 0x12.toChar
  final val FloatPlaceholder: Char = 0x13.toChar
  final val EscapeChar: Char = '\\'

  @inline def isPlaceholder(c: Char): Boolean =
    c == IntPlaceholder || c == DictPlaceholder || c == FloatPlaceholder

  /** The placeholder kind sequence of a logtype — 'i'/'f'/'d' per variable
    * in CLP order, escapes skipped. Drives splitting a merged var stream
    * back into (encoded vars, dict ids) without decoding. */
  def placeholderKinds(logtype: String): Array[Char] = {
    val out = new scala.collection.mutable.ArrayBuffer[Char](8)
    var i = 0
    while (i < logtype.length) {
      val c = logtype.charAt(i)
      if (c == EscapeChar) i += 2
      else {
        if (c == IntPlaceholder) out += 'i'
        else if (c == FloatPlaceholder) out += 'f'
        else if (c == DictPlaceholder) out += 'd'
        i += 1
      }
    }
    out.toArray
  }

  /** Non-delimiters are exactly: `+ - . 0-9 A-Z \ _ a-z`; everything else
    * (including all non-ASCII) delimits tokens. */
  @inline def isDelim(c: Char): Boolean =
    !(c == '+' || (c >= '-' && c <= '.') || (c >= '0' && c <= '9') ||
      (c >= 'A' && c <= 'Z') || c == '\\' || c == '_' || (c >= 'a' && c <= 'z'))

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isHexChar(c: Char): Boolean =
    (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F') || isDigit(c)

  /** Whether the token could be a multi-digit hex value: `[a-fA-F0-9]{2,}`. */
  def couldBeMultiDigitHex(s: String, begin: Int, end: Int): Boolean = {
    if (end - begin < 2) return false
    var i = begin
    while (i < end) {
      if (!isHexChar(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /**
   * Finds the bounds of the next variable token at or after `fromPos`.
   * A variable is a token (maximal run of non-delimiters) that either contains
   * a decimal digit, is directly preceded by '=' and contains a letter, or
   * could be a multi-digit hex value. Returns (begin, end) or null-sentinel (-1, -1).
   */
  def nextVarBounds(msg: String, fromPos: Int): (Int, Int) = {
    val n = msg.length
    var endPos = fromPos
    while (true) {
      var beginPos = endPos
      while (beginPos < n && isDelim(msg.charAt(beginPos))) beginPos += 1
      if (beginPos == n) return (-1, -1)
      var containsDigit = false
      var containsAlpha = false
      endPos = beginPos
      var break = false
      while (endPos < n && !break) {
        val c = msg.charAt(endPos)
        if (isDigit(c)) { containsDigit = true; endPos += 1 }
        else if (isAlpha(c)) { containsAlpha = true; endPos += 1 }
        else if (isDelim(c)) break = true
        else endPos += 1
      }
      if (containsDigit ||
          (beginPos > 0 && msg.charAt(beginPos - 1) == '=' && containsAlpha) ||
          couldBeMultiDigitHex(msg, beginPos, endPos)) {
        return (beginPos, endPos)
      }
    }
    (-1, -1) // unreachable
  }

  /**
   * Strict integer representability: no zero-padding, no '+' sign, '-' only with a
   * nonzero first digit; must fit an int64. Returns the value or None.
   */
  def tryEncodeInt(s: String): Option[Long] = {
    val n = s.length
    if (n == 0) return None
    if (s.charAt(0) == '-') {
      if (n < 2 || s.charAt(1) < '1' || s.charAt(1) > '9') return None
    } else {
      if (!isDigit(s.charAt(0))) return None
      if (n > 1 && s.charAt(0) == '0') return None
    }
    // full-string int64 parse; overflow or stray chars => not an int var
    try Some(java.lang.Long.parseLong(s))
    catch { case _: NumberFormatException => None }
  }

  private final val FloatDigitsBitMask: Long = (1L << 54) - 1

  /**
   * Float representability and 64-bit packing, format (MSB→LSB):
   * [1b negative | 1b unused | 54b digits-as-int | 4b num_digits-1 | 4b decimal_pos_from_right-1].
   * Preserves trailing zeros ("1.500" != "1.5") — required for byte-exact decode.
   */
  def tryEncodeFloat(s: String): Option[Long] = {
    if (s.isEmpty) return None
    var pos = 0
    var maxLength = 16 + 1 // 16 digits + decimal point
    var negative = false
    if (s.charAt(0) == '-') { negative = true; pos = 1; maxLength += 1 }
    if (s.length > maxLength) return None
    var numDigits = 0
    var decimalPos = -1 // distance of '.' from the right end
    var digits = 0L
    val n = s.length
    while (pos < n) {
      val c = s.charAt(pos)
      if (isDigit(c)) { digits = digits * 10 + (c - '0'); numDigits += 1 }
      else if (decimalPos < 0 && c == '.') decimalPos = n - 1 - pos
      else return None
      pos += 1
    }
    if (decimalPos <= 0 || numDigits == 0) return None
    var bits = if (negative) 1L else 0L
    bits <<= 55
    bits |= digits & FloatDigitsBitMask
    bits <<= 4
    bits |= (numDigits - 1) & 0x0f
    bits <<= 4
    bits |= (decimalPos - 1) & 0x0f
    Some(bits)
  }

  /** Inverse of [[tryEncodeFloat]] — reproduces the original string byte-for-byte. */
  def decodeFloat(encoded: Long): String = {
    var bits = encoded
    val decimalPos = (bits & 0x0f).toInt + 1
    bits >>>= 4
    val numDigits = (bits & 0x0f).toInt + 1
    bits >>>= 4
    var digits = bits & FloatDigitsBitMask
    bits >>>= 55
    val negative = bits > 0
    val len = numDigits + 1 + (if (negative) 1 else 0)
    val out = new Array[Char](len)
    val dotIx = len - 1 - decimalPos
    out(dotIx) = '.'
    if (negative) out(0) = '-'
    var toFill = numDigits
    var pos = len - 1
    while (toFill > 0) {
      if (pos != dotIx) {
        out(pos) = ('0' + (digits % 10)).toChar
        digits /= 10
        toFill -= 1
      }
      pos -= 1
    }
    new String(out)
  }

  /** One parsed+encoded message: the three streams. `encodedVars` holds int/float
    * packed values in placeholder order; `dictVars` holds dictionary-variable
    * strings in placeholder order (IDs assigned later by the distributed dict build). */
  final case class Encoded(logtype: String, dictVars: Array[String], encodedVars: Array[Long]) {
    override def equals(o: Any): Boolean = o match {
      case e: Encoded => e.logtype == logtype &&
        java.util.Arrays.equals(e.encodedVars, encodedVars) &&
        e.dictVars.toSeq == dictVars.toSeq
      case _ => false
    }
  }

  /** Appends msg[from,until) to the logtype, escaping placeholder bytes and '\'. */
  private def appendConstantEscaped(msg: String, from: Int, until: Int, out: java.lang.StringBuilder): Unit = {
    var i = from
    while (i < until) {
      val c = msg.charAt(i)
      if (c == EscapeChar || isPlaceholder(c)) out.append(EscapeChar)
      out.append(c)
      i += 1
    }
  }

  /** Single-pass tokenize + encode of one message. */
  def encode(msg: String): Encoded = {
    val logtype = new java.lang.StringBuilder(msg.length + 8)
    val dictVars = new ArrayBuffer[String](4)
    val encVars = new ArrayBuffer[Long](4)
    var lastEnd = 0
    var cont = true
    while (cont) {
      val (b, e) = nextVarBounds(msg, lastEnd)
      if (b < 0) cont = false
      else {
        appendConstantEscaped(msg, lastEnd, b, logtype)
        val tok = msg.substring(b, e)
        tryEncodeInt(tok) match {
          case Some(v) => logtype.append(IntPlaceholder); encVars += v
          case None => tryEncodeFloat(tok) match {
            case Some(v) => logtype.append(FloatPlaceholder); encVars += v
            case None => logtype.append(DictPlaceholder); dictVars += tok
          }
        }
        lastEnd = e
      }
    }
    appendConstantEscaped(msg, lastEnd, msg.length, logtype)
    Encoded(logtype.toString, dictVars.toArray, encVars.toArray)
  }

  /** Byte-exact inverse of [[encode]]: splice decoded variables between the
    * logtype's constants, honoring escape bytes. */
  def decode(logtype: String, encodedVars: Array[Long], dictVars: Array[String]): String = {
    val out = new java.lang.StringBuilder(logtype.length + 16 * (if (encodedVars == null) 0 else encodedVars.length))
    var i = 0
    var encIx = 0
    var dictIx = 0
    val n = logtype.length
    while (i < n) {
      val c = logtype.charAt(i)
      if (c == EscapeChar && i + 1 < n) {
        out.append(logtype.charAt(i + 1)); i += 2
      } else if (c == IntPlaceholder) {
        out.append(java.lang.Long.toString(encodedVars(encIx))); encIx += 1; i += 1
      } else if (c == FloatPlaceholder) {
        out.append(decodeFloat(encodedVars(encIx))); encIx += 1; i += 1
      } else if (c == DictPlaceholder) {
        out.append(dictVars(dictIx)); dictIx += 1; i += 1
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** (numIntVars, numFloatVars, numDictVars) of a logtype, escape-aware. */
  def placeholderCounts(logtype: String): (Int, Int, Int) = {
    var ints = 0; var floats = 0; var dicts = 0
    var i = 0
    val n = logtype.length
    while (i < n) {
      val c = logtype.charAt(i)
      if (c == EscapeChar) i += 2
      else {
        if (c == IntPlaceholder) ints += 1
        else if (c == FloatPlaceholder) floats += 1
        else if (c == DictPlaceholder) dicts += 1
        i += 1
      }
    }
    (ints, floats, dicts)
  }

  /**
   * Merges int/float encoded values and dictionary-variable IDs into the single
   * CLP-order `encoded_vars` stream (one int64 per placeholder, dict IDs bit-cast),
   * mirroring the reference's storage row (ts, logtype_id, encoded_vars)
   * [components/core/src/clp/streaming_archive/writer/File.hpp:18-22].
   */
  def mergeVars(logtype: String, encodedVars: Array[Long], dictIds: Array[Long]): Array[Long] = {
    val (ints, floats, dicts) = placeholderCounts(logtype)
    val out = new Array[Long](ints + floats + dicts)
    var i = 0; var outIx = 0; var encIx = 0; var dictIx = 0
    val n = logtype.length
    while (i < n) {
      val c = logtype.charAt(i)
      if (c == EscapeChar) i += 2
      else {
        if (c == IntPlaceholder || c == FloatPlaceholder) {
          out(outIx) = encodedVars(encIx); outIx += 1; encIx += 1
        } else if (c == DictPlaceholder) {
          out(outIx) = dictIds(dictIx); outIx += 1; dictIx += 1
        }
        i += 1
      }
    }
    out
  }
}

package graft.core

/**
 * Format-preserving timestamp parse/format — re-expression of the reference's
 * TimestampPattern (components/core/src/clp/TimestampPattern.cpp:120-430,
 * 751-900): a strptime-like directive engine with EXACT padding so that
 * `format(patternId, parse(s)) == s` byte-for-byte, plus the built-in pattern
 * list (the commonly observed subset).
 *
 * Directives: %Y 4-digit year · %y 2-digit year (69 pivot) · %m 2-digit month
 * · %d 2-digit day · %e space-padded day · %H 2-digit hour · %k space-padded
 * hour · %M minute · %S second · %3 3-digit milliseconds · %b month
 * abbreviation (Jan…) · %% literal.
 */
object TimestampPatterns {

  /** Built-in patterns, id = index (mirrors the reference's observed list). */
  val Patterns: IndexedSeq[String] = IndexedSeq(
    "%Y-%m-%dT%H:%M:%S.%3",
    "%Y-%m-%dT%H:%M:%S,%3",
    "%Y-%m-%d %H:%M:%S.%3",
    "%Y-%m-%d %H:%M:%S,%3",
    "%Y/%m/%dT%H:%M:%S.%3",
    "%Y/%m/%d %H:%M:%S.%3",
    "[%Y-%m-%d %H:%M:%S,%3]",
    "<<<%Y-%m-%d %H:%M:%S:%3",
    "%d %b %Y %H:%M:%S,%3",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "[%Y%m%d-%H:%M:%S]",
    "%y/%m/%d %H:%M:%S",
    "%y%m%d %k:%M:%S")

  private val Months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val CumDays = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)

  @inline private def isLeap(y: Int): Boolean =
    (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  private def toEpochMs(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int, ms: Int): Long = {
    // days since 1970-01-01 (proleptic Gregorian)
    var days = 0L
    var yy = 1970
    while (yy < y) { days += (if (isLeap(yy)) 366 else 365); yy += 1 }
    days += CumDays(mo - 1) + (if (mo > 2 && isLeap(y)) 1 else 0) + (d - 1)
    (((days * 24 + h) * 60 + mi) * 60 + s) * 1000 + ms
  }

  private def fromEpochMs(epochMs: Long): (Int, Int, Int, Int, Int, Int, Int) = {
    val ms = (epochMs % 1000).toInt
    val secs = epochMs / 1000
    val daySecs = ((secs % 86400) + 86400) % 86400
    var days = (secs - daySecs) / 86400
    val h = (daySecs / 3600).toInt
    val mi = ((daySecs % 3600) / 60).toInt
    val s = (daySecs % 60).toInt
    var y = 1970
    var continue = true
    while (continue) {
      val len = if (isLeap(y)) 366 else 365
      if (days >= len) { days -= len; y += 1 } else continue = false
    }
    var mo = 11
    var found = false
    while (!found && mo >= 0) {
      val start = CumDays(mo) + (if (mo >= 2 && isLeap(y)) 1 else 0)
      if (days >= start) found = true else mo -= 1
    }
    val d = (days - (CumDays(mo) + (if (mo >= 2 && isLeap(y)) 1 else 0))).toInt + 1
    (y, mo + 1, d, h, mi, s, ms)
  }

  /** Parses `msg` against one pattern starting at offset 0.
    * @return epochMs and the matched length, or None. */
  def parseOne(msg: String, pattern: String): Option[(Long, Int)] = {
    var i = 0 // msg position
    var p = 0 // pattern position
    var y = 1970; var mo = 1; var d = 1; var h = 0; var mi = 0; var s = 0; var ms = 0
    def digits(k: Int): Int = {
      if (i + k > msg.length) return -1
      var v = 0
      var j = 0
      while (j < k) {
        val c = msg.charAt(i + j)
        if (c < '0' || c > '9') return -1
        v = v * 10 + (c - '0'); j += 1
      }
      i += k
      v
    }
    while (p < pattern.length) {
      val pc = pattern.charAt(p)
      if (pc == '%' && p + 1 < pattern.length) {
        pattern.charAt(p + 1) match {
          case 'Y' => val v = digits(4); if (v < 0) return None; y = v
          // two-digit pivot; 69 maps forward (the engine is defined on
          // epoch >= 0, i.e. years 1970-2099)
          case 'y' => val v = digits(2); if (v < 0) return None
                      y = if (v < 69) 2000 + v else if (v == 69) 2069 else 1900 + v
          case 'm' => val v = digits(2); if (v < 1 || v > 12) return None; mo = v
          case 'd' => val v = digits(2); if (v < 1 || v > 31) return None; d = v
          case 'e' =>
            if (i + 2 > msg.length) return None
            if (msg.charAt(i) == ' ') { i += 1; val v = digits(1); if (v < 1) return None; d = v }
            else { val v = digits(2); if (v < 1 || v > 31) return None; d = v }
          case 'H' => val v = digits(2); if (v < 0 || v > 23) return None; h = v
          case 'k' =>
            if (i + 2 > msg.length) return None
            if (msg.charAt(i) == ' ') { i += 1; val v = digits(1); if (v < 0) return None; h = v }
            else { val v = digits(2); if (v < 0 || v > 23) return None; h = v }
          case 'M' => val v = digits(2); if (v < 0 || v > 59) return None; mi = v
          case 'S' => val v = digits(2); if (v < 0 || v > 60) return None; s = v
          case '3' => val v = digits(3); if (v < 0) return None; ms = v
          case 'b' =>
            if (i + 3 > msg.length) return None
            val ix = Months.indexOf(msg.substring(i, i + 3))
            if (ix < 0) return None
            mo = ix + 1; i += 3
          case '%' =>
            if (i >= msg.length || msg.charAt(i) != '%') return None
            i += 1
          case _ => return None
        }
        p += 2
      } else {
        if (i >= msg.length || msg.charAt(i) != pc) return None
        i += 1; p += 1
      }
    }
    Some((toEpochMs(y, mo, d, h, mi, s, ms), i))
  }

  /** Scans the built-in patterns (first match wins, like the reference's
    * search_known_ts_patterns). Returns (patternId, epochMs, matchedLen). */
  def search(msg: String): Option[(Int, Long, Int)] = {
    var id = 0
    while (id < Patterns.length) {
      parseOne(msg, Patterns(id)) match {
        case Some((epoch, len)) => return Some((id, epoch, len))
        case None =>
      }
      id += 1
    }
    None
  }

  /** Byte-exact inverse: renders epochMs in the given pattern. */
  def format(patternId: Int, epochMs: Long): String = {
    val pattern = Patterns(patternId)
    val (y, mo, d, h, mi, s, ms) = fromEpochMs(epochMs)
    val out = new java.lang.StringBuilder(pattern.length + 8)
    var p = 0
    def pad(v: Int, k: Int): Unit = {
      val str = v.toString
      var z = k - str.length
      while (z > 0) { out.append('0'); z -= 1 }
      out.append(str)
    }
    while (p < pattern.length) {
      val pc = pattern.charAt(p)
      if (pc == '%' && p + 1 < pattern.length) {
        pattern.charAt(p + 1) match {
          case 'Y' => pad(y, 4)
          case 'y' => pad(y % 100, 2)
          case 'm' => pad(mo, 2)
          case 'd' => pad(d, 2)
          case 'e' => if (d < 10) out.append(' ').append(('0' + d).toChar) else pad(d, 2)
          case 'H' => pad(h, 2)
          case 'k' => if (h < 10) out.append(' ').append(('0' + h).toChar) else pad(h, 2)
          case 'M' => pad(mi, 2)
          case 'S' => pad(s, 2)
          case '3' => pad(ms, 3)
          case 'b' => out.append(Months(mo - 1))
          case '%' => out.append('%')
          case other => out.append('%').append(other)
        }
        p += 2
      } else { out.append(pc); p += 1 }
    }
    out.toString
  }
}

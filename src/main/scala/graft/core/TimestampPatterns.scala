package graft.core

/**
 * Format-preserving timestamp parse/format — re-expression of the reference's
 * TimestampPattern (components/core/src/clp/TimestampPattern.cpp:120-205
 * built-in list, :238-745 parse, :751-905 format): a strptime-like directive
 * engine with EXACT padding so that `format(patternId, parse(s))` reproduces
 * the matched span byte-for-byte, plus the full built-in pattern list.
 *
 * Each pattern carries `spacesBefore`: the timestamp starts after that many
 * spaces on the line (e.g. `INFO [main] 2015-01-31 …` parses with
 * spacesBefore=2), mirroring the reference's num_spaces_before_ts.
 *
 * Directives: %Y 4-digit year · %y 2-digit year (69 pivot) · %m 2-digit month
 * · %d 2-digit day · %e space-padded day · %H 2-digit hour · %k space-padded
 * hour · %I zero-padded 12h hour · %l space-padded 12h hour · %p AM/PM ·
 * %M minute · %S second · %3 3-digit milliseconds · %b month abbreviation ·
 * %B full month name · %a weekday abbreviation (parsed, ignored; re-derived
 * on format) · %#3 relative timestamp in ms (no leading zero) · %% literal.
 */
object TimestampPatterns {

  /** (spacesBefore, format) — id = index; reference order (first match wins). */
  final case class TsPattern(spacesBefore: Int, fmt: String)

  val Patterns: IndexedSeq[TsPattern] = IndexedSeq(
    TsPattern(0, "%Y-%m-%dT%H:%M:%S.%3"),     // 2015-01-31T15:50:45.392
    TsPattern(0, "%Y-%m-%dT%H:%M:%S,%3"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S.%3"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S,%3"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S.%3"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S,%3"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S.%3"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S,%3"),
    TsPattern(0, "[%Y-%m-%d %H:%M:%S,%3]"),
    TsPattern(2, "%Y-%m-%d %H:%M:%S,%3"),     // INFO [main] 2015-01-31 15:50:45,085
    TsPattern(0, "<<<%Y-%m-%d %H:%M:%S:%3"),
    TsPattern(0, "%d %b %Y %H:%M:%S,%3"),     // 01 Jan 2016 15:50:17,085
    TsPattern(0, "%Y-%m-%dT%H:%M:%S"),
    TsPattern(0, "%Y-%m-%d %H:%M:%S"),
    TsPattern(0, "%Y/%m/%dT%H:%M:%S"),
    TsPattern(0, "%Y/%m/%d %H:%M:%S"),
    TsPattern(0, "[%Y-%m-%dT%H:%M:%S"),
    TsPattern(0, "[%Y%m%d-%H:%M:%S]"),        // [20170106-16:56:41]
    TsPattern(1, "%Y-%m-%d  %H:%M:%S"),       // Start-Date: 2015-01-31  15:50:45
    TsPattern(0, "%y/%m/%d %H:%M:%S"),
    TsPattern(0, "%y%m%d %k:%M:%S"),          // 150131  9:50:45
    TsPattern(0, "%b %d, %Y %l:%M:%S %p"),    // Jan 01, 2016  3:50:17 PM
    TsPattern(0, "%B %d, %Y %H:%M"),          // January 31, 2015 15:50
    TsPattern(1, "[%d/%b/%Y:%H:%M:%S"),       // E [31/Jan/2015:15:50:45
    TsPattern(3, "[%d/%b/%Y:%H:%M:%S"),       // 1.2.3.4 - - [01/Jan/2016:15:50:17
    TsPattern(3, "[%d/%m/%Y:%H:%M:%S"),
    TsPattern(6, "%Y-%m-%d %H:%M:%S"),        // Started POST "…" for 1.2.3.4 at 2017-06-18 00:20:44
    TsPattern(1, "%Y-%m-%d %H:%M:%S"),        // update-alternatives 2015-01-31 15:50:45
    TsPattern(4, "%a %b %e %H:%M:%S %Y"),     // ERROR: apport (pid 4557) Sun Jan  1 15:50:45 2015
    TsPattern(0, "%a %b %e %H:%M:%S %Y"),
    TsPattern(0, "%b %d %H:%M:%S"),           // Jan 21 11:56:42 (year-less, imprecise)
    TsPattern(0, "%m-%d %H:%M:%S.%3"),        // 01-21 11:56:42.392 (year-less)
    TsPattern(0, "%#3"))                      // 916321 (relative ms)

  private val Months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val FullMonths = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val Days = Array("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")
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

  /** Day-of-week index (Sun=0) for the date of `epochMs`; epoch day 0 was a
    * Thursday. */
  private def dayOfWeek(epochMs: Long): Int = {
    val days = math.floorDiv(math.floorDiv(epochMs, 1000L), 86400L)
    (((days + 4) % 7 + 7) % 7).toInt
  }

  /** One timestamp match: pattern id, epoch ms, and the matched span. */
  final case class TsMatch(patternId: Int, epochMs: Long, begin: Int, end: Int)

  /** Parses `msg` against one pattern starting at `from`.
    * @return epochMs and the end index (exclusive), or None. */
  def parseOne(msg: String, pattern: String, from: Int = 0): Option[(Long, Int)] = {
    var i = from // msg position
    var p = 0    // pattern position
    var y = 1970; var mo = 1; var d = 1; var h = 0; var mi = 0; var s = 0; var ms = 0
    var is12h = false; var isPm = false
    var relativeMs = -1L
    def digits(k: Int, spacePad: Boolean = false): Int = {
      if (i + k > msg.length) return -1
      var v = 0
      var j = 0
      var seenDigit = false
      while (j < k) {
        val c = msg.charAt(i + j)
        if (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); seenDigit = true }
        else if (c == ' ' && spacePad && !seenDigit) () // leading space pad
        else return -1
        j += 1
      }
      if (!seenDigit) return -1
      i += k
      v
    }
    while (p < pattern.length) {
      val pc = pattern.charAt(p)
      if (pc == '%' && p + 1 < pattern.length) {
        pattern.charAt(p + 1) match {
          // reject pre-epoch years instead of matching: toEpochMs is defined
          // on 1970+, and a "match" it cannot represent would silently
          // rewrite the line on reconstruction (1969-12-31 → 1970-12-31)
          case 'Y' => val v = digits(4); if (v < 1970) return None; y = v
          // two-digit pivot; 69 maps forward (the engine is defined on
          // epoch >= 0, i.e. years 1970-2099)
          case 'y' => val v = digits(2); if (v < 0) return None
                      y = if (v < 69) 2000 + v else if (v == 69) 2069 else 1900 + v
          case 'm' => val v = digits(2); if (v < 1 || v > 12) return None; mo = v
          case 'd' => val v = digits(2); if (v < 1 || v > 31) return None; d = v
          case 'e' => val v = digits(2, spacePad = true)
                      if (v < 1 || v > 31) return None; d = v
          case 'H' => val v = digits(2); if (v < 0 || v > 23) return None; h = v
          case 'k' => val v = digits(2, spacePad = true)
                      if (v < 0 || v > 23) return None; h = v
          case 'I' => val v = digits(2); if (v < 1 || v > 12) return None
                      h = v; is12h = true
          case 'l' => val v = digits(2, spacePad = true)
                      if (v < 1 || v > 12) return None; h = v; is12h = true
          case 'p' =>
            if (i + 2 > msg.length) return None
            msg.substring(i, i + 2) match {
              case "AM" => isPm = false
              case "PM" => isPm = true
              case _ => return None
            }
            i += 2
          case 'M' => val v = digits(2); if (v < 0 || v > 59) return None; mi = v
          // :60 (leap second) is rejected, not matched: epoch ms has no
          // representation for it, so format() would render the NEXT minute
          // and break the byte-exact reconstruction contract
          case 'S' => val v = digits(2); if (v < 0 || v > 59) return None; s = v
          case '3' => val v = digits(3); if (v < 0) return None; ms = v
          case 'b' =>
            if (i + 3 > msg.length) return None
            val ix = Months.indexOf(msg.substring(i, i + 3))
            if (ix < 0) return None
            mo = ix + 1; i += 3
          case 'B' =>
            var ix = -1
            var m = 0
            while (ix < 0 && m < 12) {
              if (msg.startsWith(FullMonths(m), i)) ix = m else m += 1
            }
            if (ix < 0) return None
            mo = ix + 1; i += FullMonths(ix).length
          case 'a' =>
            // weekday parsed but not used (not needed for the absolute time)
            var ok = false
            var k = 0
            while (!ok && k < 7) {
              if (msg.startsWith(Days(k), i)) { ok = true; i += 3 } else k += 1
            }
            if (!ok) return None
          case '#' =>
            // relative timestamp: %#3 = milliseconds, no leading zero
            if (p + 2 >= pattern.length || pattern.charAt(p + 2) != '3') return None
            if (i >= msg.length || msg.charAt(i) == '0') return None
            var v = 0L
            var n = 0
            while (i < msg.length && msg.charAt(i) >= '0' && msg.charAt(i) <= '9') {
              v = v * 10 + (msg.charAt(i) - '0'); i += 1; n += 1
            }
            if (n == 0) return None
            relativeMs = v
            p += 1 // consumed the extra '3'
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
    if (relativeMs >= 0) return Some((relativeMs, i))
    // day-in-month validation: Feb 31 would otherwise "match" and roll into
    // March via the cumulative-days arithmetic, reformatting as a different
    // date — reject so the line stays unmatched and byte-preserved
    val dim = if (mo == 2) { if (isLeap(y)) 29 else 28 }
      else if (mo == 4 || mo == 6 || mo == 9 || mo == 11) 30 else 31
    if (d > dim) return None
    if (is12h) {
      // 12 AM = 0h; PMs other than 12 add 12 (reference :712-725)
      if (h == 12) { if (!isPm) h = 0 } else if (isPm) h += 12
    }
    Some((toEpochMs(y, mo, d, h, mi, s, ms), i))
  }

  /** Index just past the Nth space of `msg`, or -1 if fewer spaces exist. */
  private def afterNthSpace(msg: String, n: Int): Int = {
    if (n == 0) return 0
    var found = 0
    var i = 0
    while (i < msg.length && found < n) {
      if (msg.charAt(i) == ' ') found += 1
      i += 1
    }
    if (found < n) -1 else i
  }

  /** Scans the built-in patterns (first match wins, like the reference's
    * search_known_ts_patterns); honors each pattern's spaces-before prefix. */
  def searchFull(msg: String): Option[TsMatch] = {
    var id = 0
    while (id < Patterns.length) {
      val pat = Patterns(id)
      val from = afterNthSpace(msg, pat.spacesBefore)
      if (from >= 0) {
        parseOne(msg, pat.fmt, from) match {
          case Some((epoch, end)) => return Some(TsMatch(id, epoch, from, end))
          case None =>
        }
      }
      id += 1
    }
    None
  }

  /** Compat view of [[searchFull]]: (patternId, epochMs, endIx). */
  def search(msg: String): Option[(Int, Long, Int)] =
    searchFull(msg).map(m => (m.patternId, m.epochMs, m.end))

  /** Byte-exact inverse: renders epochMs in the given pattern (the matched
    * span only — any spaces-before prefix belongs to the message, not the
    * timestamp). */
  def format(patternId: Int, epochMs: Long): String = {
    val pattern = Patterns(patternId).fmt
    val (y, mo, d, h, mi, s, ms) = fromEpochMs(epochMs)
    val out = new java.lang.StringBuilder(pattern.length + 8)
    var p = 0
    def pad(v: Int, k: Int, padChar: Char = '0'): Unit = {
      val str = v.toString
      var z = k - str.length
      while (z > 0) { out.append(padChar); z -= 1 }
      out.append(str)
    }
    val h12 = if (h % 12 == 0) 12 else h % 12
    while (p < pattern.length) {
      val pc = pattern.charAt(p)
      if (pc == '%' && p + 1 < pattern.length) {
        pattern.charAt(p + 1) match {
          case 'Y' => pad(y, 4)
          case 'y' => pad(y % 100, 2)
          case 'm' => pad(mo, 2)
          case 'd' => pad(d, 2)
          case 'e' => pad(d, 2, ' ')
          case 'H' => pad(h, 2)
          case 'k' => pad(h, 2, ' ')
          case 'I' => pad(h12, 2)
          case 'l' => pad(h12, 2, ' ')
          case 'p' => out.append(if (h >= 12) "PM" else "AM")
          case 'M' => pad(mi, 2)
          case 'S' => pad(s, 2)
          case '3' => pad(ms, 3)
          case 'b' => out.append(Months(mo - 1))
          case 'B' => out.append(FullMonths(mo - 1))
          case 'a' => out.append(Days(dayOfWeek(epochMs)))
          case '#' => out.append(epochMs.toString); p += 1 // %#3
          case '%' => out.append('%')
          case other => out.append('%').append(other)
        }
        p += 2
      } else { out.append(pc); p += 1 }
    }
    out.toString
  }
}

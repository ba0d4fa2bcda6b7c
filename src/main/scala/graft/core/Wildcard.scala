package graft.core

/**
 * CLP-style wildcard ("glob") matching with `*` (any run), `?` (any one char) and
 * `\` escapes. Semantics re-expressed from the reference
 * (components/core/src/clp/string_utils/string_utils.cpp:156-337): a two-bookmark
 * backtracking matcher over groups delimited by '*'.
 *
 * Precondition for [[matchesCaseSensitive]]: the pattern has been normalized by
 * [[cleanUp]] (no consecutive '*', no dangling trailing escape).
 */
object Wildcard {

  @inline private def isWildcard(c: Char): Boolean = c == '*' || c == '?'

  /** Collapses runs of '*', drops escapes of non-(wildcard|escape) chars, and
    * removes a dangling trailing '\'. Reference: clean_up_wildcard_search_string. */
  def cleanUp(pattern: String): String = {
    val out = new java.lang.StringBuilder(pattern.length)
    var i = 0
    val n = pattern.length
    var escaped = false
    while (i < n) {
      val c = pattern.charAt(i)
      if (escaped) {
        escaped = false
        if (isWildcard(c) || c == '\\') out.append('\\')
        out.append(c)
        i += 1
      } else if (c == '*') {
        out.append(c)
        i += 1
        while (i < n && pattern.charAt(i) == '*') i += 1
      } else {
        if (c == '\\') escaped = true else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Removes one level of '\' escaping. */
  def unescape(str: String): String = {
    val out = new java.lang.StringBuilder(str.length)
    var escaped = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (escaped) { out.append(c); escaped = false }
      else if (c == '\\') escaped = true
      else out.append(c)
      i += 1
    }
    out.toString
  }

  def matches(tame: String, wild: String, caseSensitive: Boolean): Boolean =
    if (caseSensitive) matchesCaseSensitive(tame, wild)
    else matchesCaseSensitive(tame.toLowerCase, wild.toLowerCase)

  /** Case-sensitive matcher; `wild` must be pre-cleaned (see class doc). */
  def matchesCaseSensitive(tame: String, wild: String): Boolean = {
    val tameLen = tame.length
    val wildLen = wild.length
    if (wildLen == 0) return tameLen == 0
    if (tameLen == 0) return wild == "*"

    var t = 0 // tame cursor
    var w = 0 // wild cursor
    var tBookmark = -1
    var wBookmark = -1

    // Advances t until tame(t) matches the (possibly escaped) literal at wild(w);
    // sets the tame bookmark. Returns false if tame is exhausted first.
    def advanceTameToNextMatch(): Boolean = {
      var wc = wild.charAt(w)
      if (wc != '?') {
        if (wc == '\\') { w += 1; wc = wild.charAt(w) }
        var found = false
        while (!found) {
          if (t == tameLen) return false
          if (tame.charAt(t) == wc) found = true else t += 1
        }
      }
      tBookmark = t
      true
    }

    while (true) {
      var wc = wild.charAt(w)
      if (wc == '*') {
        w += 1
        if (w == wildLen) return true // trailing '*'
        wBookmark = w
        if (!advanceTameToNextMatch()) return false
      } else {
        var escaped = false
        if (wc == '\\') { escaped = true; w += 1; wc = wild.charAt(w) }
        val tc = tame.charAt(t)
        if (!((!escaped && wc == '?') || tc == wc)) {
          if (wBookmark < 0) return false
          w = wBookmark
          t = tBookmark + 1
          if (!advanceTameToNextMatch()) return false
        }
      }
      t += 1
      w += 1
      if (t == tameLen) {
        return w == wildLen || (wild.charAt(w) == '*' && w + 1 == wildLen)
      } else if (w == wildLen) {
        // wild exhausted but tame is not: back to the last '*' group
        if (wBookmark < 0) return false
        w = wBookmark
        t = tBookmark + 1
        if (!advanceTameToNextMatch()) return false
        // loop back to the top without consuming
      }
    }
    false // unreachable
  }
}

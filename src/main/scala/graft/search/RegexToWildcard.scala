package graft.search

/**
 * Regex → CLP-wildcard translation for the supported regex subset — the
 * re-expression of the reference's regex_utils
 * (components/core/src/clp/regex_utils/regex_translation_utils.cpp, 426 LoC;
 * config semantics RegexToWildcardTranslatorConfig.hpp). Users with regex
 * habits feed a regex; the translator either produces an exactly-equivalent
 * wildcard query for the existing compiler, or refuses with the reason
 * (never a silently-wrong approximation).
 *
 * Single-line assumption: regex `.` does not match `\n` while wildcard
 * `?`/`*` match any char, so the translation is exact only for inputs
 * without newlines. CLP log events are newline-split before matching (the
 * message splitter owns line boundaries), so every matcher input here is
 * single-line by construction; callers feeding multi-line text must split
 * first or the wildcard may over-match.
 *
 * Supported: literals, `.` → `?`, `.*` → `*`, `.+` → `?*`, escaped
 * metachars, single-char charsets (`[y]`, `[\]]`, `[-]`, …), same-letter
 * case pairs (`[xX]`) under the case-insensitive config, `^`/`$` anchors
 * (with optional prefix/suffix `*` for substring semantics). Everything
 * else (alternation, groups, repetition counts, real character classes)
 * is refused.
 */
object RegexToWildcard {

  /** @param caseInsensitive the wildcard will run case-insensitively, so
    *                        `[xX]` collapses to `x`
    * @param addPrefixSuffixWildcards substring search: wrap with `*` where
    *                        the corresponding anchor is absent */
  final case class Config(
      caseInsensitive: Boolean = false,
      addPrefixSuffixWildcards: Boolean = false)

  /** Chars whose escaped form `\c` is legal regex and translates to the raw
    * char (escaped again in the wildcard only if wildcard-special). */
  private val EscapableSet = "*+?|^$.{}[]()<>-_/=!\\".toSet

  private def isWildcardSpecial(c: Char): Boolean = c == '*' || c == '?' || c == '\\'

  private def emit(sb: java.lang.StringBuilder, c: Char): Unit = {
    if (isWildcardSpecial(c)) sb.append('\\')
    sb.append(c)
  }

  def translate(regex: String, cfg: Config = Config()): Either[String, String] = {
    val n = regex.length
    var i = 0
    var startAnchor = false
    if (i < n && regex.charAt(i) == '^') { startAnchor = true; i += 1 }
    var endAnchor = false
    val sb = new java.lang.StringBuilder

    while (i < n) {
      regex.charAt(i) match {
        case '.' =>
          if (i + 1 < n && regex.charAt(i + 1) == '*') {
            if (i + 2 < n && regex.charAt(i + 2) == '*')
              return Left("untranslatable '*' after '.*'")
            if (i + 2 < n && regex.charAt(i + 2) == '+')
              return Left("untranslatable '+' after '.*'")
            sb.append('*'); i += 2
          } else if (i + 1 < n && regex.charAt(i + 1) == '+') {
            sb.append("?*"); i += 2
          } else { sb.append('?'); i += 1 }
        case '*' => return Left("untranslatable bare '*' (bounded repetition of a literal)")
        case '+' => return Left("untranslatable bare '+' (bounded repetition of a literal)")
        case '?' => return Left("unsupported '?' (optional atom has no wildcard form)")
        case '|' => return Left("unsupported alternation '|'")
        case '^' => return Left("illegal mid-string '^'")
        case '$' =>
          // legal only as a (possibly repeated) end anchor
          if (regex.substring(i).forall(_ == '$')) { endAnchor = true; i = n }
          else return Left("illegal mid-string '$'")
        case '(' | ')' | '{' | '}' =>
          return Left(s"unsupported group/repetition metachar '${regex.charAt(i)}'")
        case '\\' =>
          if (i + 1 >= n) return Left("dangling escape")
          val c = regex.charAt(i + 1)
          if (!EscapableSet.contains(c)) return Left(s"illegal escape sequence \\$c")
          emit(sb, c); i += 2
        case '[' =>
          charset(regex, i, cfg) match {
            case Right((c, next)) => emit(sb, c); i = next
            case Left(err) => return Left(err)
          }
        case c => sb.append(c); i += 1
      }
    }

    var out = sb.toString
    if (cfg.addPrefixSuffixWildcards) {
      if (!startAnchor && !out.startsWith("*")) out = "*" + out
      if (!endAnchor && !endsWithUnescapedStar(out)) out = out + "*"
    }
    Right(out)
  }

  private def endsWithUnescapedStar(s: String): Boolean = {
    if (!s.endsWith("*")) return false
    var backslashes = 0
    var i = s.length - 2
    while (i >= 0 && s.charAt(i) == '\\') { backslashes += 1; i -= 1 }
    backslashes % 2 == 0
  }

  /** Parses `[...]` at `from`; succeeds only for effectively-single-char
    * sets (plus `[xX]` pairs under case-insensitive). Returns (char, next). */
  private def charset(regex: String, from: Int, cfg: Config): Either[String, (Char, Int)] = {
    val n = regex.length
    var i = from + 1
    val members = scala.collection.mutable.ArrayBuffer.empty[Char]
    var closed = false
    while (i < n && !closed) {
      regex.charAt(i) match {
        case ']' => closed = true; i += 1
        case '\\' =>
          if (i + 1 >= n) return Left("incomplete charset (dangling escape)")
          val c = regex.charAt(i + 1)
          // Same contract as the top-level escape: class shorthands (\d, \w,
          // \s, …) have no single-char wildcard form — refuse, never emit the
          // letter literally.
          if (!EscapableSet.contains(c))
            return Left(s"illegal escape sequence \\$c in charset")
          members += c; i += 2
        case c => members += c; i += 1
      }
    }
    if (!closed) return Left("incomplete charset structure")
    members.toSeq match {
      case Seq(c) => Right((c, i))
      case Seq(a, b)
          if cfg.caseInsensitive && a.isLetter && b.isLetter &&
            a.toLower == b.toLower && a != b =>
        Right((a.toLower, i))
      case _ => Left("unsupported charset pattern (only single-char sets translate)")
    }
  }
}

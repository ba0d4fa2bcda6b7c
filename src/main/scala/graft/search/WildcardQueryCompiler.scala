package graft.search

import scala.collection.mutable.ArrayBuffer

import graft.core.{ClpEncoding, Wildcard}

/**
 * Driver-side compilation of a wildcard search string into pruned,
 * encoded-domain subqueries — the Spark re-expression of the reference's
 * GrepCore::process_raw_query (components/core/src/clp/GrepCore.hpp:156-274)
 * + QueryToken classification (components/core/src/clp/QueryToken.cpp:28-90):
 *
 *   - non-wildcard variable tokens encode exactly (int/float bit pattern or
 *     var-dictionary ID); a dict token absent from the dictionary prunes the
 *     whole query to WontMatch before touching data (R1)
 *   - wildcarded tokens are ambiguous — each enumerates up to three
 *     interpretations (template text / dictionary variable via a dict
 *     wildcard scan (Q4) / encoded numeric), and the cartesian product over
 *     tokens yields the subquery set (R11), capped with a loose fallback
 *   - every subquery carries a template-space wildcard pattern (matched
 *     against the logtype dictionary, Q5), the ordered exact query vars
 *     (subsequence-matched in the encoded domain, R12), and any-of var-ID
 *     sets from wildcarded dict probes
 */
object WildcardQueryCompiler {

  /** One enumerated interpretation combination. */
  final case class SubPlan(
      logtypePattern: String,
      exactVars: Seq[Long],
      anyOfVarSets: Seq[Seq[Long]])

  final case class Compiled(
      cleanedQuery: String,
      subplans: Seq[SubPlan],
      verifyText: Boolean,
      matchAll: Boolean)

  sealed trait Result
  case object WontMatch extends Result
  final case class Plan(c: Compiled) extends Result

  private val MaxSubplans = 64

  @inline private def isWild(c: Char): Boolean = c == '*' || c == '?'

  /** Escapes one constant char for the template-space pattern: first the
    * template's own escaping (placeholders + backslash), then the pattern
    * escaping of wildcards and backslash. */
  private def appendConstChar(c: Char, out: java.lang.StringBuilder): Unit = {
    if (c == ClpEncoding.EscapeChar) out.append("\\\\\\\\")
    else if (ClpEncoding.isPlaceholder(c)) out.append("\\\\").append(c)
    else if (isWild(c)) out.append('\\').append(c)
    else out.append(c)
  }

  // ---- query token stream ---------------------------------------------------

  private sealed trait Piece
  private final case class Const(text: String) extends Piece // cleaned-query form (may hold lone '*'/'?' runs)
  private final case class ExactVar(token: String) extends Piece
  private final case class WildToken(token: String) extends Piece

  /** Splits the cleaned query into constants, exact variable tokens, and
    * wildcarded (ambiguous) tokens. Wildcards glued to token chars belong to
    * the token — `*error*` is ONE ambiguous token, exactly like the
    * reference's get_bounds_of_next_potential_var over queries. */
  private def tokenize(cleaned: String): Seq[Piece] = {
    val out = ArrayBuffer.empty[Piece]
    val n = cleaned.length
    var i = 0
    var prevChar: Char = 0
    val constBuf = new java.lang.StringBuilder
    def flushConst(): Unit =
      if (constBuf.length > 0) { out += Const(constBuf.toString); constBuf.setLength(0) }
    // after Wildcard.cleanUp the only escape pairs are \* \? \\ : an escaped
    // wildcard is a LITERAL '*'/'?' — a delimiter in message space, so it
    // stays constant pattern text — while an escaped backslash is a literal
    // '\', a TOKEN char (ClpEncoding.isDelim('\\') is false), and must join
    // the surrounding token run or tokens like "C:\dir1" become unfindable
    def isEscBackslash(ix: Int): Boolean =
      cleaned.charAt(ix) == '\\' && ix + 1 < n && cleaned.charAt(ix + 1) == '\\'
    while (i < n) {
      val c = cleaned.charAt(i)
      val isTokenChar = (c != '\\' && (!ClpEncoding.isDelim(c) || isWild(c))) ||
        isEscBackslash(i)
      if (c == '\\' && !isEscBackslash(i) && i + 1 < n) {
        constBuf.append(c).append(cleaned.charAt(i + 1))
        prevChar = cleaned.charAt(i + 1)
        i += 2
      } else if (!isTokenChar) {
        constBuf.append(c); prevChar = c; i += 1
      } else {
        // scan the full run of token chars + wildcards + escaped backslashes
        val start = i
        var hasWild = false
        var hasDigit = false
        var hasAlpha = false
        var more = true
        while (i < n && more) {
          val tc = cleaned.charAt(i)
          if (tc == '\\') {
            if (isEscBackslash(i)) i += 2 // literal '\': neither digit nor alpha
            else more = false             // \* \? : literal delimiter → const
          } else if (!ClpEncoding.isDelim(tc) || isWild(tc)) {
            if (isWild(tc)) hasWild = true
            else if (tc >= '0' && tc <= '9') hasDigit = true
            else if ((tc >= 'a' && tc <= 'z') || (tc >= 'A' && tc <= 'Z')) hasAlpha = true
            i += 1
          } else more = false
        }
        val token = cleaned.substring(start, i)
        val bare = Wildcard.unescape(token).filterNot(isWild)
        if (bare.isEmpty) {
          // pure wildcards between delimiters — plain pattern chars
          constBuf.append(token)
        } else if (hasWild) {
          flushConst(); out += WildToken(token)
        } else {
          val isVar = hasDigit ||
            (prevChar == '=' && hasAlpha) ||
            ClpEncoding.couldBeMultiDigitHex(bare, 0, bare.length)
          if (isVar) { flushConst(); out += ExactVar(token) }
          else constBuf.append(token)
        }
        prevChar = if (i > start) cleaned.charAt(i - 1) else prevChar
      }
    }
    flushConst()
    out.toSeq
  }

  // ---- interpretation enumeration ------------------------------------------

  /** One interpretation of a wildcarded token: the pattern piece plus an
    * optional any-of var-ID constraint. */
  private final case class Interp(piece: String, varIds: Option[Seq[Long]])

  private def interpretations(t: WildToken,
                              dictScan: String => Seq[Long]): Seq[Interp] = {
    val out = ArrayBuffer.empty[Interp]
    val tok = t.token
    // tok may contain \\ escape pairs (literal backslashes); unescape before
    // classifying the literal chars
    val bare = Wildcard.unescape(tok).filterNot(isWild)
    val lead = if (tok.head == '*') "*" else ""
    val trail = if (tok.length > 1 && tok.last == '*') "*" else ""
    // (a) template text — only possible when the literal part carries no digit
    // (digit-bearing message tokens always become variables, never constants)
    if (!bare.exists(c => c >= '0' && c <= '9')) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < tok.length) {
        val c = tok.charAt(k)
        if (c == '\\' && k + 1 < tok.length) { appendConstChar(tok.charAt(k + 1), sb); k += 2 }
        else if (isWild(c)) { sb.append(c); k += 1 }
        else { appendConstChar(c, sb); k += 1 }
      }
      out += Interp(sb.toString, None)
    }
    // (b) dictionary variable: wildcard probe of the var dictionary (Q4)
    val ids = dictScan(tok)
    if (ids.nonEmpty) out += Interp(lead + ClpEncoding.DictPlaceholder + trail, Some(ids))
    // (c) encoded numeric: plausible only if the literal part is digits/./-/+
    if (bare.forall(c => (c >= '0' && c <= '9') || c == '.' || c == '-' || c == '+')) {
      out += Interp(lead + ClpEncoding.IntPlaceholder + trail, None)
      out += Interp(lead + ClpEncoding.FloatPlaceholder + trail, None)
    }
    // (d) loose fallback for interior wildcards: a greedy mid-token '*' (or
    // any '?', which can match a delimiter) lets the literal pieces span
    // MULTIPLE message tokens, so none of the precise single-token
    // interpretations above is sound as the only option — the reference
    // falls back to '*' and marks wildcard_match_required
    // (components/core/src/clp/GrepCore.hpp:379-390). verifyText is already
    // forced true for any wildcarded token, so the final decoded-text
    // wildcard match removes the false positives this admits.
    val inner = tok.dropWhile(_ == '*').reverse.dropWhile(_ == '*').reverse
    if (inner.exists(isWild)) out += Interp("*", None)
    out.toSeq
  }

  /**
   * @param query raw wildcard query over the original text
   * @param varDictLookup exact-match lookup: token → var-dict ID
   * @param varDictScan wildcard probe: pattern → matching var-dict IDs
   * @param caseSensitive if false, exact dict tokens use the scan (imprecise)
   */
  def compile(query: String,
              varDictLookup: String => Option[Long],
              varDictScan: String => Seq[Long] = _ => Nil,
              caseSensitive: Boolean = true): Result = {
    val cleaned = Wildcard.cleanUp(query)
    if (cleaned == "*" || cleaned.isEmpty)
      return Plan(Compiled(cleaned, Nil, verifyText = false, matchAll = true))

    val pieces = tokenize(cleaned)
    val wildTokens = pieces.collect { case w: WildToken => w }
    var verifyText = wildTokens.nonEmpty

    // resolve exact vars up-front (shared by all subplans; a miss = WontMatch)
    val exactResolved = scala.collection.mutable.Map.empty[String, (Char, Either[Long, Seq[Long]])]
    for (ExactVar(tok) <- pieces.collect { case e: ExactVar => e }) {
      if (!exactResolved.contains(tok)) {
        // tok is in cleaned (pattern) form; the dictionary holds LITERAL
        // text, so \\ pairs unescape before any lookup (the scan path keeps
        // the pattern form — Wildcard.matches interprets the escapes)
        val lit = Wildcard.unescape(tok)
        ClpEncoding.tryEncodeInt(lit) match {
          case Some(v) => exactResolved(tok) = ('i', Left(v))
          case None => ClpEncoding.tryEncodeFloat(lit) match {
            case Some(v) => exactResolved(tok) = ('f', Left(v))
            case None =>
              if (caseSensitive) {
                varDictLookup(lit) match {
                  case Some(id) => exactResolved(tok) = ('d', Left(id))
                  case None => return WontMatch
                }
              } else {
                val ids = varDictScan(tok) // case-insensitive scan done by caller
                if (ids.isEmpty) return WontMatch
                verifyText = true
                exactResolved(tok) = ('d', Right(ids))
              }
          }
        }
      }
    }

    // enumerate interpretation combinations over the wildcarded tokens
    val perToken: Seq[Seq[Interp]] = wildTokens.map(interpretations(_, varDictScan))
    if (perToken.exists(_.isEmpty)) return WontMatch
    val nCombos = perToken.foldLeft(1L)((acc, s) => acc * s.size)
    val combos: Seq[Seq[Interp]] =
      if (wildTokens.isEmpty) Seq(Nil)
      else if (nCombos > MaxSubplans)
        Seq(wildTokens.map(_ => Interp("*", None))) // loose fallback, verify catches
      else perToken.foldLeft(Seq(Seq.empty[Interp])) { (acc, opts) =>
        for (prefix <- acc; o <- opts) yield prefix :+ o
      }

    val subplans = combos.map { combo =>
      val pattern = new java.lang.StringBuilder(cleaned.length + 8)
      val exactVars = ArrayBuffer.empty[Long]
      val anyOf = ArrayBuffer.empty[Seq[Long]]
      var wi = 0
      pieces.foreach {
        case Const(text) =>
          var k = 0
          while (k < text.length) {
            val c = text.charAt(k)
            if (c == '\\' && k + 1 < text.length) {
              appendConstChar(text.charAt(k + 1), pattern); k += 2
            } else if (isWild(c)) { pattern.append(c); k += 1 }
            else { appendConstChar(c, pattern); k += 1 }
          }
        case ExactVar(tok) =>
          val (kind, v) = exactResolved(tok)
          val ph = kind match {
            case 'i' => ClpEncoding.IntPlaceholder
            case 'f' => ClpEncoding.FloatPlaceholder
            case _ => ClpEncoding.DictPlaceholder
          }
          pattern.append(ph)
          v match {
            case Left(value) => exactVars += value
            case Right(ids) => anyOf += ids
          }
        case _: WildToken =>
          val interp = combo(wi); wi += 1
          pattern.append(interp.piece)
          interp.varIds.foreach(anyOf += _)
      }
      SubPlan(pattern.toString, exactVars.toSeq, anyOf.toSeq)
    }

    // a pattern wildcard can absorb logtype PLACEHOLDERS: '?' may swallow a
    // whole multi-char variable ("? cat" matching text "55 cat"), and '*'
    // unanchors the var constraints (subseq_match is order-only, so
    // "* cat 5" would admit "5 cat 7") — in both cases only the decoded-text
    // match is sound (the reference's wildcard_match_required,
    // GrepCore.hpp:379-390). Pure-wildcard runs between delimiters land in
    // Const pieces, so wildTokens.nonEmpty alone does not cover this.
    def unescapedWild(p: String, w: Char): Boolean = {
      var k = 0
      while (k < p.length) {
        val c = p.charAt(k)
        if (c == '\\') k += 2
        else if (c == w) return true
        else k += 1
      }
      false
    }
    val verify = verifyText || subplans.exists(p =>
      unescapedWild(p.logtypePattern, '?') ||
        (unescapedWild(p.logtypePattern, '*') &&
          (p.exactVars.nonEmpty || p.anyOfVarSets.nonEmpty)))

    Plan(Compiled(cleaned, subplans, verify, matchAll = false))
  }
}

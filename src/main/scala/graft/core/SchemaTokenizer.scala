package graft.core

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

/**
 * User-schema ("grok"-style) tokenizer — the Spark-first re-expression of the
 * reference's log-surgeon schema mode (schema files like
 * components/core/tests/test_schema_files/real_schema.txt: a `delimiters:`
 * line + named regex variables in priority order, dispatched in
 * components/core/src/clp/clp/FileCompressor.cpp:190-292).
 *
 * Semantics (documented contract of THIS engine): delimiters split the
 * message into tokens; each token is classified by the FIRST schema variable
 * whose regex matches the ENTIRE token; unmatched tokens are constant text.
 * A variable named `timestamp` is special-cased: it may match a multi-token
 * prefix of the message (reference: timestamp-at-line-start drives event
 * splitting). Variables named `int` / `float` encode into the packed numeric
 * forms when representable; everything else becomes a dictionary variable.
 * Decode is [[ClpEncoding.decode]] — the logtype/placeholder format is shared
 * with the heuristic tokenizer, so the whole downstream pipeline (dictionary
 * build, routing, search, decode) is tokenizer-agnostic.
 */
final case class TokenizerSchema(delimiters: String, variables: Seq[(String, String)])
    extends Serializable {
  @transient private lazy val compiledPatterns: Array[(String, Pattern)] =
    variables.map { case (n, p) => (n, Pattern.compile(p)) }.toArray
  def compiled: Array[(String, Pattern)] = compiledPatterns
  @inline def isDelim(c: Char): Boolean = delimiters.indexOf(c.toInt) >= 0
  @transient lazy val timestampPatterns: Array[Pattern] =
    compiled.collect { case ("timestamp", p) => p }
}

object TokenizerSchema {

  /** The heuristic-equivalent defaults used when no schema file is given. */
  val DefaultDelimiters: String =
    (0 to 127).map(_.toChar).filter(ClpEncoding.isDelim).mkString

  /**
   * Parses the reference's schema-file format: `// comments`,
   * `delimiters: <chars with \r \n \t \\ escapes>`, and `name:regex` lines.
   */
  def parse(text: String): TokenizerSchema = {
    var delims = " \t\r\n"
    val vars = ArrayBuffer.empty[(String, String)]
    text.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).foreach { line =>
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
        val body = line.substring(colon + 1)
        if (name == "delimiters") delims = unescapeDelims(body.trim)
        else vars += name -> body.trim
      }
    }
    TokenizerSchema(delims, vars.toSeq)
  }

  private def unescapeDelims(s: String): String = {
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'r' => out.append('\r')
          case 'n' => out.append('\n')
          case 't' => out.append('\t')
          case 's' => out.append(' ')
          case other => out.append(other)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

object SchemaTokenizer {
  import ClpEncoding._

  /** One-pass schema-driven tokenize + encode into the shared Encoded form. */
  def encode(msg: String, schema: TokenizerSchema): Encoded = {
    val logtype = new java.lang.StringBuilder(msg.length + 8)
    val dictVars = ArrayBuffer.empty[String]
    val encVars = ArrayBuffer.empty[Long]

    def appendConst(from: Int, until: Int): Unit = {
      var i = from
      while (i < until) {
        val c = msg.charAt(i)
        if (c == EscapeChar || isPlaceholder(c)) logtype.append(EscapeChar)
        logtype.append(c)
        i += 1
      }
    }

    def emitVar(name: String, tok: String): Unit = name match {
      case "int" =>
        tryEncodeInt(tok) match {
          case Some(v) => logtype.append(IntPlaceholder); encVars += v
          case None => logtype.append(DictPlaceholder); dictVars += tok
        }
      case "float" =>
        tryEncodeFloat(tok) match {
          case Some(v) => logtype.append(FloatPlaceholder); encVars += v
          case None => logtype.append(DictPlaceholder); dictVars += tok
        }
      case _ => logtype.append(DictPlaceholder); dictVars += tok
    }

    var pos = 0
    val n = msg.length
    // timestamp prefix (may span delimiters)
    schema.timestampPatterns.foreach { p =>
      if (pos == 0) {
        val m = p.matcher(msg)
        if (m.lookingAt() && m.end() > 0) {
          emitVar("timestamp", msg.substring(0, m.end()))
          pos = m.end()
        }
      }
    }
    while (pos < n) {
      // skip delimiters into the constant
      val constStart = pos
      while (pos < n && schema.isDelim(msg.charAt(pos))) pos += 1
      appendConst(constStart, pos)
      if (pos < n) {
        val tokStart = pos
        while (pos < n && !schema.isDelim(msg.charAt(pos))) pos += 1
        val tok = msg.substring(tokStart, pos)
        val hit = schema.compiled.find { case (name, p) =>
          name != "timestamp" && p.matcher(tok).matches()
        }
        hit match {
          case Some((name, _)) => emitVar(name, tok)
          case None => appendConst(tokStart, pos)
        }
      }
    }
    Encoded(logtype.toString, dictVars.toArray, encVars.toArray)
  }
}

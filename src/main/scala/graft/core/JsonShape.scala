package graft.core

/**
 * Per-record JSON shape discovery — the Spark-side re-expression of the
 * clp_s merged-parse-tree ingestion (SURVEY §1.2): each JSONL record is
 * reduced to its set of typed leaf nodes, and `schema_id` identifies the
 * exact record shape so same-shaped records can be stored/queried together
 * (components/core/src/clp_s/JsonParser.cpp:304-318 typing rules,
 * SchemaTree.hpp:32-47 node kinds, Schema/SchemaMap dedup →
 * ArchiveWriter.hpp:192).
 *
 * Typing rules reproduced:
 *   - JSON string WITH a space  → ClpString  (CLP-encodable message)
 *   - JSON string without space → VarString  (whole string to the var dict)
 *   - number with '.'/'e'       → Float, else Integer
 *   - true/false                → Boolean;  null → NullValue
 *   - array                     → UnstructuredArray (one leaf; the clp_s
 *                                 default without --structurize-arrays)
 *   - object                    → recurse (dotted path); empty obj → Object
 *
 * The canonical descriptor is the '.'-joined leaf paths with types, sorted
 * and ';'-joined; `schema_id = md5(descriptor)` — deterministic across
 * engines (DuckDB can recompute it), the distributed twin of the
 * reference's sequential schema-ID assignment.
 */
object JsonShape {

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at $pos")

  /** One typed leaf with its value in canonical text form:
    *   - Integer/Float/Boolean/NullValue: the literal token text (Float keeps
    *     its exact formatting — the clp_s FormattedFloat idea,
    *     components/core/src/clp_s/FloatFormatEncoding.*)
    *   - ClpString/VarString: the decoded string content
    *   - UnstructuredArray: the raw JSON substring
    *   - Object (empty): "{}"
    */
  final case class Leaf(path: String, nodeType: String, value: String)

  /** Typed leaves of one record: (dotted path, node-type name), unsorted. */
  def leaves(json: String): List[(String, String)] =
    typedLeaves(json).map(l => (l.path, l.nodeType))

  /**
   * Typed leaves WITH values, in document order.
   *
   * @param retainFloatFormat the clp_s `--retain-float-format` mode
   *        (JsonParser.cpp:255-283): float leaves become `FormattedFloat`
   *        when [[FloatFormat]] can reproduce the literal from
   *        (double, format-word), else `DictionaryFloat` (string dict);
   *        off ⇒ plain `Float`.
   */
  def typedLeaves(json: String, retainFloatFormat: Boolean = false): List[Leaf] = {
    val out = List.newBuilder[Leaf]
    val n = json.length
    var i = 0

    def err(m: String): Nothing = throw ParseError(m, i)
    def ws(): Unit = while (i < n && (json.charAt(i) == ' ' || json.charAt(i) == '\t' ||
      json.charAt(i) == '\n' || json.charAt(i) == '\r')) i += 1

    // returns the parsed string AND whether it contained an unescaped space
    def string(): String = {
      if (json.charAt(i) != '"') err("expected string")
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < n && json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) err("dangling escape")
          json.charAt(i + 1) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'n' => sb.append('\n')
            case 't' => sb.append('\t'); case 'r' => sb.append('\r')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'u' =>
              if (i + 5 >= n) err("short unicode escape")
              val hex = json.substring(i + 2, i + 6)
              if (!hex.forall(h => (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                  (h >= 'A' && h <= 'F'))) err(s"bad unicode escape \\u$hex")
              sb.append(Integer.parseInt(hex, 16).toChar)
              i += 4
            case other => err(s"bad escape \\$other")
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) err("unterminated string")
      i += 1 // closing quote
      sb.toString
    }

    def skipValue(): Unit = { // for array elements: type is the array itself
      ws()
      json.charAt(i) match {
        case '"' => string(); ()
        case '{' =>
          i += 1; ws()
          if (json.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); string(); ws()
              if (json.charAt(i) != ':') err("expected ':'")
              i += 1; skipValue(); ws()
              if (json.charAt(i) == ',') i += 1 else more = false
            }
            if (json.charAt(i) != '}') err("expected '}'"); i += 1
          }
        case '[' =>
          i += 1; ws()
          if (json.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              skipValue(); ws()
              if (json.charAt(i) == ',') i += 1 else more = false
            }
            if (json.charAt(i) != ']') err("expected ']'"); i += 1
          }
        case _ => scalarTail()
      }
    }

    // strict JSON number shape: -?digits(.digits)?([eE][+-]?digits)?
    def isJsonNumber(s: String): Boolean = {
      var j = 0
      val m = s.length
      if (j < m && s.charAt(j) == '-') j += 1
      val d0 = j
      while (j < m && s.charAt(j).isDigit) j += 1
      if (j == d0) return false
      if (j < m && s.charAt(j) == '.') {
        j += 1
        val f0 = j
        while (j < m && s.charAt(j).isDigit) j += 1
        if (j == f0) return false
      }
      if (j < m && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
        j += 1
        if (j < m && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
        val e0 = j
        while (j < m && s.charAt(j).isDigit) j += 1
        if (j == e0) return false
      }
      j == m
    }

    // consumes a non-string, non-composite scalar; returns (type, literal)
    def scalarTail(): (String, String) = {
      val start = i
      while (i < n && !",}] \t\n\r".contains(json.charAt(i))) i += 1
      json.substring(start, i) match {
        case t @ ("true" | "false") => ("Boolean", t)
        case t @ "null" => ("NullValue", t)
        case num if num.nonEmpty && isJsonNumber(num) =>
          if (num.exists(c => c == '.' || c == 'e' || c == 'E')) ("Float", num)
          // integers beyond int64 follow the reference's simdjson behavior:
          // they parse as doubles, i.e. Float nodes
          else if (num.toLongOption.isDefined) ("Integer", num)
          else ("Float", num)
        case bad => err(s"invalid scalar '$bad'")
      }
    }

    def value(path: String): Unit = {
      ws()
      if (i >= n) err("truncated")
      json.charAt(i) match {
        case '"' =>
          val s = string()
          out += Leaf(path, if (s.indexOf(' ') >= 0) "ClpString" else "VarString", s)
        case '{' =>
          i += 1; ws()
          if (i < n && json.charAt(i) == '}') { i += 1; out += Leaf(path, "Object", "{}") }
          else {
            var more = true
            while (more) {
              ws()
              val key = string()
              // the descriptor flattens paths with '.' and separates leaves
              // with ';'/':' — keys containing those would silently alias
              // distinct shapes ({"a.b":1} vs {"a":{"b":1}}), so refuse
              // loudly (the reference's parent-id tree has no such limit;
              // documented simplification)
              if (key.exists(c => c == '.' || c == ';' || c == ':'))
                err(s"unsupported key character in '$key'")
              ws()
              if (i >= n || json.charAt(i) != ':') err("expected ':'")
              i += 1
              value(if (path.isEmpty) key else s"$path.$key")
              ws()
              if (i < n && json.charAt(i) == ',') i += 1 else more = false
            }
            if (i >= n || json.charAt(i) != '}') err("expected '}'")
            i += 1
          }
        case '[' =>
          // one UnstructuredArray leaf; contents validated but kept as the
          // raw serialized-JSON substring (clp_s unstructured arrays)
          val arrStart = i
          i += 1; ws()
          if (i < n && json.charAt(i) == ']') i += 1
          else {
            var more = true
            while (more) {
              skipValue(); ws()
              if (i < n && json.charAt(i) == ',') i += 1 else more = false
            }
            if (i >= n || json.charAt(i) != ']') err("expected ']'")
            i += 1
          }
          out += Leaf(path, "UnstructuredArray", json.substring(arrStart, i))
        case _ =>
          val (t0, text) = scalarTail()
          val t =
            if (t0 == "Float" && retainFloatFormat)
              if (FloatFormat.encode(text).isDefined) "FormattedFloat" else "DictionaryFloat"
            else t0
          out += Leaf(path, t, text)
      }
    }

    value("")
    ws()
    if (i != n) err("trailing content")
    out.result()
  }

  /** Canonical shape descriptor: sorted `path:Type` pairs, ';'-joined. */
  def descriptor(json: String): String =
    leaves(json).map { case (p, t) => s"$p:$t" }.sorted.mkString(";")

  /** Deterministic schema id — md5 hex of the descriptor (cross-engine). */
  def schemaId(json: String): String = md5Hex(descriptor(json))

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}

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
   * @param timestampKey the clp_s `--timestamp-key` column (dotted path):
   *        a string leaf at this path is typed `DateString`
   *        (JsonParser.cpp:558-574; numeric leaves keep their type but still
   *        feed the timestamp range index, see
   *        JsonParser.adjust_archive_node_type_for_timestamp)
   * @param structurizeArrays the clp_s `--structurize-arrays` mode
   *        (CommandLineArguments.cpp:256-257, JsonParser.cpp:477-495): an
   *        array leaf becomes `StructuredArray` (still carrying the raw
   *        array text as its value) plus value-less child TYPE leaves at
   *        `path.[]` (scalar elements) / `path.[].k` (object-element
   *        fields) / nested `[]` hops — the distributed twin of the
   *        reference's unnamed child nodes under the array node. Off ⇒ one
   *        `UnstructuredArray` leaf (the clp_s default).
   */
  def typedLeaves(json: String, retainFloatFormat: Boolean = false,
                  timestampKey: Option[String] = None,
                  structurizeArrays: Boolean = false): List[Leaf] = {
    val out = List.newBuilder[Leaf]
    val n = json.length
    var i = 0

    def err(m: String): Nothing = throw ParseError(m, i)
    def ws(): Unit = while (i < n && (json.charAt(i) == ' ' || json.charAt(i) == '\t' ||
      json.charAt(i) == '\n' || json.charAt(i) == '\r')) i += 1

    // truncated input must surface as ParseError, never an index exception
    def cur(): Char = { if (i >= n) err("truncated"); json.charAt(i) }

    // returns the parsed string AND whether it contained an unescaped space
    def string(): String = {
      if (cur() != '"') err("expected string")
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
      cur() match {
        case '"' => string(); ()
        case '{' =>
          i += 1; ws()
          if (cur() == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); string(); ws()
              if (cur() != ':') err("expected ':'")
              i += 1; skipValue(); ws()
              if (cur() == ',') i += 1 else more = false
            }
            if (cur() != '}') err("expected '}'"); i += 1
          }
        case '[' =>
          i += 1; ws()
          if (cur() == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              skipValue(); ws()
              if (cur() == ',') i += 1 else more = false
            }
            if (cur() != ']') err("expected ']'"); i += 1
          }
        case _ => scalarTail()
      }
    }

    // strict JSON number grammar: -?(0|[1-9]digits)(.digits)?([eE][+-]?digits)?
    // ASCII digits only — Char.isDigit accepts Unicode digit classes that
    // Double/Long parsing rejects, turning invalid JSON into crashes later
    def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
    def isJsonNumber(s: String): Boolean = {
      var j = 0
      val m = s.length
      if (j < m && s.charAt(j) == '-') j += 1
      val d0 = j
      while (j < m && isAsciiDigit(s.charAt(j))) j += 1
      if (j == d0) return false
      // leading zeros are invalid JSON ("007"); a lone 0 is fine
      if (s.charAt(d0) == '0' && j > d0 + 1) return false
      if (j < m && s.charAt(j) == '.') {
        j += 1
        val f0 = j
        while (j < m && isAsciiDigit(s.charAt(j))) j += 1
        if (j == f0) return false
      }
      if (j < m && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
        j += 1
        if (j < m && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
        val e0 = j
        while (j < m && isAsciiDigit(s.charAt(j))) j += 1
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
          // they parse as doubles, i.e. Float nodes. Integer nodes guarantee
          // a CANONICAL literal (value == value.toLong.toString) so encoders
          // may round-trip through Long — the one non-canonical survivor of
          // the strict grammar, "-0", types as Float (it is an IEEE concept;
          // Float keeps the exact literal text)
          else if (num.toLongOption.exists(_.toString == num)) ("Integer", num)
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
          val t =
            if (timestampKey.contains(path)) "DateString"
            else if (s.indexOf(' ') >= 0) "ClpString" else "VarString"
          out += Leaf(path, t, s)
        case '{' =>
          i += 1; ws()
          if (i < n && json.charAt(i) == '}') { i += 1; out += Leaf(path, "Object", "{}") }
          else {
            var more = true
            while (more) {
              ws()
              val key = string()
              // the descriptor flattens paths with '.' and separates leaves
              // with ';'/':'; '[]'/'{}'/',' are structure markers in the
              // structurize-arrays paths and array-shape strings — keys
              // containing any of these would silently alias distinct shapes
              // ({"a.b":1} vs {"a":{"b":1}}), so refuse loudly (the
              // reference's parent-id tree has no such limit; documented
              // simplification)
              if (key.exists(c => c == '.' || c == ';' || c == ':' ||
                  c == '[' || c == ']' || c == '{' || c == '}' || c == ','))
                err(s"unsupported key character in '$key'")
              // an empty key aliases too: {"":{"a":1}} would flatten to the
              // same "a" path as {"a":1}, and a trailing empty segment is
              // dropped by split('.') on reconstruction
              if (key.isEmpty) err("unsupported empty key")
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
          // contents validated but kept as the raw serialized-JSON substring;
          // one UnstructuredArray leaf (default) or a StructuredArray leaf
          // plus value-less element-type child leaves (structurize mode)
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
          val raw = json.substring(arrStart, i)
          if (structurizeArrays) {
            out += Leaf(path, "StructuredArray", raw)
            val kids = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
            val base = if (path.isEmpty) "[]" else s"$path.[]"
            splitArrayElements(raw).foreach { elem =>
              typedLeaves(elem, retainFloatFormat, None, structurizeArrays = true)
                .foreach { l =>
                  val sub = if (l.path.isEmpty) base else s"$base.${l.path}"
                  kids += ((sub, l.nodeType))
                }
            }
            kids.foreach { case (p, t) => out += Leaf(p, t, "") }
          } else out += Leaf(path, "UnstructuredArray", raw)
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

  /** Canonical shape descriptor: sorted distinct `path:Type` pairs,
    * ';'-joined. `timestampKey`/`structurizeArrays` flow through to
    * [[typedLeaves]] (they change node typing, hence schema identity —
    * exactly like the reference, where the same corpus ingested with
    * different flags yields different MPTs). */
  def descriptor(json: String, timestampKey: Option[String] = None,
                 structurizeArrays: Boolean = false): String =
    typedLeaves(json, retainFloatFormat = false, timestampKey, structurizeArrays)
      .map(l => s"${l.path}:${l.nodeType}").distinct.sorted.mkString(";")

  // ---- array element shapes (Spark-type derivation without inference) ----

  /** Splits the top-level elements of a raw JSON array text (already
    * validated by the main parser): depth/in-string tracking only. */
  def splitArrayElements(raw: String): List[String] = {
    val out = List.newBuilder[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; if (depth == 1 && start < 0) start = i
        case '[' | '{' =>
          if (depth == 1 && start < 0) start = i
          depth += 1
        case ']' | '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += raw.substring(start, i).trim; start = -1 }
        case ',' if depth == 1 =>
          if (start >= 0) { out += raw.substring(start, i).trim; start = -1 }
        case ' ' | '\t' | '\n' | '\r' => ()
        case _ => if (depth == 1 && start < 0) start = i
      }
      i += 1
    }
    out.result()
  }

  /**
   * Canonical structure shape of one JSON value — the ingredient for
   * deriving a typed Spark schema for array columns WITHOUT a data
   * inference pass (the reference knows element types from its child nodes
   * under the array, JsonParser.cpp:337-436; we canonicalize them into a
   * string mergeable across records):
   *   scalars `L`(ong) `D`(ouble) `B`(ool) `S`(tring) `N`(ull),
   *   objects `{k1:shape;k2:shape}` (sorted keys), arrays `[elemShape]`,
   *   empty array element `E` (unknown), irreconcilable mix `X`.
   */
  def shapeOf(json: String): String = {
    val ls = typedLeaves(json)
    shapeOfLeaves(ls.map(l => (l.path, l.nodeType, l.value)))
  }

  private def shapeOfLeaves(ls: List[(String, String, String)]): String =
    ls match {
      case (("", t, v)) :: Nil => scalarShape(t, v)
      case _ =>
        // object: group dotted paths by head segment
        val groups = scala.collection.mutable.LinkedHashMap
          .empty[String, List[(String, String, String)]]
        ls.foreach { case (p, t, v) =>
          val dot = p.indexOf('.')
          val (head, rest) = if (dot < 0) (p, "") else (p.substring(0, dot), p.substring(dot + 1))
          groups(head) = groups.getOrElse(head, Nil) :+ ((rest, t, v))
        }
        groups.toSeq.sortBy(_._1)
          .map { case (k, sub) => s"$k:${shapeOfLeaves(sub)}" }
          .mkString("{", ";", "}")
    }

  private def scalarShape(t: String, value: String): String = t match {
    case "Integer" => "L"
    case "Float" | "FormattedFloat" | "DictionaryFloat" => "D"
    case "Boolean" => "B"
    case "NullValue" => "N"
    case "ClpString" | "VarString" | "DateString" => "S"
    case "Object" => "{}"
    case "UnstructuredArray" | "StructuredArray" =>
      val elems = splitArrayElements(value)
      if (elems.isEmpty) "[E]"
      else "[" + elems.map(shapeOf).reduce(mergeShape) + "]"
    case other => throw new IllegalArgumentException(s"no shape for node type $other")
  }

  /** Widening merge of two shapes (cross-element and cross-record):
    * N/E yield to anything, L+D→D, scalar mixes→S, structs merge fieldwise,
    * arrays merge elementwise, struct/array/scalar cross-kind → X. */
  def mergeShape(a: String, b: String): String = {
    if (a == b) return a
    if (a == "X" || b == "X") return "X"
    if (a == "N" || a == "E") return b
    if (b == "N" || b == "E") return a
    val aStruct = a.startsWith("{"); val bStruct = b.startsWith("{")
    val aArr = a.startsWith("["); val bArr = b.startsWith("[")
    if (aStruct && bStruct) {
      val fa = shapeFields(a); val fb = shapeFields(b)
      (fa.keySet ++ fb.keySet).toSeq.sorted.map { k =>
        (fa.get(k), fb.get(k)) match {
          case (Some(x), Some(y)) => s"$k:${mergeShape(x, y)}"
          case (Some(x), None) => s"$k:$x"
          case (None, Some(y)) => s"$k:$y"
          case _ => throw new IllegalStateException
        }
      }.mkString("{", ";", "}")
    } else if (aArr && bArr)
      "[" + mergeShape(a.substring(1, a.length - 1), b.substring(1, b.length - 1)) + "]"
    else if (aStruct || bStruct || aArr || bArr) "X"
    else if ((a == "L" || a == "D") && (b == "L" || b == "D")) "D" // numeric widening
    else "S" // scalar mix (L+S, B+L, …) widens to string, like JSON inference
  }

  /** Parses `{k:shape;…}` into its top-level field map. */
  def shapeFields(struct: String): Map[String, String] = {
    require(struct.startsWith("{") && struct.endsWith("}"), s"not a struct shape: $struct")
    val inner = struct.substring(1, struct.length - 1)
    if (inner.isEmpty) return Map.empty
    val out = Map.newBuilder[String, String]
    var depth = 0
    var start = 0
    var i = 0
    def field(s: String): Unit = {
      val c = s.indexOf(':')
      out += (s.substring(0, c) -> s.substring(c + 1))
    }
    while (i < inner.length) {
      inner.charAt(i) match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ';' if depth == 0 => field(inner.substring(start, i)); start = i + 1
        case _ => ()
      }
      i += 1
    }
    field(inner.substring(start))
    out.result()
  }

  // ---- canonical re-serialization (archive extraction) -------------------

  private def escapeJson(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /**
   * Re-serializes typed leaves (document order, from [[typedLeaves]]) back
   * to one JSON line — the marshalling half of the reference's ordered
   * reconstruction (clp_s SchemaReader + JsonConstructor.cpp:64-141).
   * Byte-exact for canonical input (minimal whitespace, standard escapes,
   * literal-preserving numbers — [[typedLeaves]] keeps the exact numeric
   * token and the raw array text, so round-trip holds for everything the
   * strict parser accepts with canonically-escaped strings). Structurize
   * child leaves (`[]` path segments, value-less) are skipped — the array
   * node itself carries the raw text.
   */
  def reserialize(leaves: List[Leaf]): String = {
    val ls = leaves.filterNot(l => l.path.contains("[]"))
    def emit(sb: java.lang.StringBuilder, l: Leaf): Unit = l.nodeType match {
      case "ClpString" | "VarString" | "DateString" =>
        sb.append('"').append(escapeJson(l.value)).append('"')
      case "Object" => sb.append("{}")
      case _ => sb.append(l.value) // numeric/bool/null literals, raw arrays
    }
    ls match {
      case Nil => "{}"
      case Leaf("", _, _) :: Nil =>
        val sb = new java.lang.StringBuilder; emit(sb, ls.head); sb.toString
      case _ =>
        val sb = new java.lang.StringBuilder(64)
        var open: List[String] = Nil // enclosing key stack, innermost first
        var first = true
        sb.append('{')
        ls.foreach { l =>
          val segs = l.path.split('.')
          val parents = segs.init.toList
          // close levels that diverge, open new ones
          val keep = open.reverse.zip(parents).takeWhile { case (a, b) => a == b }.length
          (keep until open.length).foreach { _ => sb.append('}'); open = open.tail }
          if (!first) sb.append(',')
          parents.drop(keep).foreach { k =>
            sb.append('"').append(escapeJson(k)).append("\":{")
            open = k :: open
            first = true
          }
          sb.append('"').append(escapeJson(segs.last)).append("\":")
          emit(sb, l)
          first = false
        }
        open.foreach(_ => sb.append('}'))
        sb.append('}')
        sb.toString
    }
  }

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

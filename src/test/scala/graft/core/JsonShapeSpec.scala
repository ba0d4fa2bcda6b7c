package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Shape discovery vs the clp_s typing rules
  * (components/core/src/clp_s/JsonParser.cpp:304-318, SchemaTree.hpp:32-47). */
class JsonShapeSpec extends AnyFunSuite {

  test("string typing: space => ClpString, no space => VarString") {
    assert(JsonShape.leaves("""{"a":"hello world"}""") == List("a" -> "ClpString"))
    assert(JsonShape.leaves("""{"a":"hello"}""") == List("a" -> "VarString"))
    assert(JsonShape.leaves("""{"a":""}""") == List("a" -> "VarString"))
  }

  test("numeric typing: '.'/exponent => Float, else Integer") {
    assert(JsonShape.leaves("""{"n":42}""") == List("n" -> "Integer"))
    assert(JsonShape.leaves("""{"n":-7}""") == List("n" -> "Integer"))
    assert(JsonShape.leaves("""{"n":4.25}""") == List("n" -> "Float"))
    assert(JsonShape.leaves("""{"n":1e9}""") == List("n" -> "Float"))
  }

  test("boolean, null, array, empty object") {
    assert(JsonShape.leaves("""{"b":true,"x":null}""") ==
      List("b" -> "Boolean", "x" -> "NullValue"))
    assert(JsonShape.leaves("""{"t":[1,"a",{"x":2}]}""") ==
      List("t" -> "UnstructuredArray"))
    assert(JsonShape.leaves("""{"o":{}}""") == List("o" -> "Object"))
  }

  test("nested objects produce dotted paths") {
    assert(JsonShape.leaves("""{"a":{"b":{"c":1},"d":"x y"}}""") ==
      List("a.b.c" -> "Integer", "a.d" -> "ClpString"))
  }

  test("descriptor is sorted and schema_id is order-insensitive") {
    val a = """{"z":1,"a":"x"}"""
    val b = """{"a":"x","z":1}"""
    assert(JsonShape.descriptor(a) == "a:VarString;z:Integer")
    assert(JsonShape.schemaId(a) == JsonShape.schemaId(b))
    assert(JsonShape.schemaId(a) != JsonShape.schemaId("""{"a":"x","z":1.5}"""))
  }

  test("escapes inside strings do not break typing") {
    assert(JsonShape.leaves("""{"a":"no space?"}""") == List("a" -> "ClpString"))
    assert(JsonShape.leaves("""{"a":"q\"uote"}""") == List("a" -> "VarString"))
  }

  test("malformed input raises, not mis-parses") {
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":1} extra"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a" 1}"""))
    // invalid scalars must not be silently typed
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":tru}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":NaN}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":1.}"""))
    // keys that would corrupt the flattened-path descriptor refuse loudly
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a.b":1}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a;b":1}"""))
  }

  test("number strictness: leading zeros and unicode digits refuse; -0 stays literal") {
    // JSON grammar forbids leading zeros; Char.isDigit lookalikes (Unicode
    // digit classes) would pass typing but crash Double/Long parsing later
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":007}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("{\"a\":1٥}"))
    intercept[JsonShape.ParseError](JsonShape.leaves("{\"a\":1.٥}"))
    assert(JsonShape.leaves("""{"a":0}""") == List("a" -> "Integer"))
    assert(JsonShape.leaves("""{"a":-10}""") == List("a" -> "Integer"))
    // "-0" has no canonical long rendering — it types Float (literal-text
    // channel), so every encoder round-trips it byte-exactly
    val neg0 = JsonShape.typedLeaves("""{"a":-0}""")
    assert(neg0 == List(JsonShape.Leaf("a", "Float", "-0")))
    assert(JsonShape.reserialize(neg0) == """{"a":-0}""")
  }

  test("empty keys refuse: they alias distinct structures") {
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"":1}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"":{"a":1}}"""))
    intercept[JsonShape.ParseError](JsonShape.leaves("""{"a":{"":1}}"""))
  }

  test("truncated input raises ParseError on every path, never an index error") {
    for (s <- Seq("{", "[", "[1,", """{"a":[""", """{"a":{"b":1""",
        """["x"""", """{"a":[1 """, """{"a":[{"b"""", """["""))
      intercept[JsonShape.ParseError](JsonShape.typedLeaves(s))
  }

  test("integers beyond int64 type as Float (simdjson double behavior)") {
    assert(JsonShape.leaves("""{"n":99999999999999999999}""") == List("n" -> "Float"))
    assert(JsonShape.leaves(s"""{"n":${Long.MaxValue}}""") == List("n" -> "Integer"))
  }

  test("md5 hex matches the engine convention (lowercase, 32 chars)") {
    assert(JsonShape.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("timestamp key types the designated string leaf as DateString") {
    val ls = JsonShape.typedLeaves("""{"ts":"2024-01-02 03:04:00","msg":"a b"}""",
      timestampKey = Some("ts"))
    assert(ls.map(l => (l.path, l.nodeType)) ==
      List("ts" -> "DateString", "msg" -> "ClpString"))
    // numeric timestamp keys keep their numeric type (reference
    // adjust_archive_node_type_for_timestamp: only string family converts)
    val num = JsonShape.typedLeaves("""{"ts":1704164640}""", timestampKey = Some("ts"))
    assert(num.head.nodeType == "Integer")
    // nested dotted timestamp key
    val nested = JsonShape.typedLeaves("""{"a":{"t":"2024-01-02T03:04:00"}}""",
      timestampKey = Some("a.t"))
    assert(nested.head.nodeType == "DateString")
  }

  test("array element shapes: scalars, structs, nesting, widening merges") {
    assert(JsonShape.shapeOf("""[1,2,3]""") == "[L]")
    assert(JsonShape.shapeOf("""[1,2.5]""") == "[D]")
    assert(JsonShape.shapeOf("""["a","b c"]""") == "[S]")
    assert(JsonShape.shapeOf("""[1,"a"]""") == "[S]")
    assert(JsonShape.shapeOf("""[null,true]""") == "[B]")
    assert(JsonShape.shapeOf("""[]""") == "[E]")
    assert(JsonShape.shapeOf("""[{"a":999},{"b":1001}]""") == "[{a:L;b:L}]")
    assert(JsonShape.shapeOf("""[[1,2],[3]]""") == "[[L]]")
    assert(JsonShape.shapeOf("""[{"a":1},5]""") == "[X]")
    assert(JsonShape.mergeShape("[E]", "[L]") == "[L]")
    assert(JsonShape.mergeShape("[{a:L}]", "[{a:D;b:S}]") == "[{a:D;b:S}]")
    assert(JsonShape.shapeFields("{a:L;b:{c:[S]}}") == Map("a" -> "L", "b" -> "{c:[S]}"))
  }

  test("reserialize round-trips canonical records byte-exactly") {
    val corpus = Seq(
      """{"id":7,"level":"info","msg":"the fast key order","k":42}""",
      """{"id":1,"msg":"Msg 1: \"Abc123\""}""",
      """{"id":4,"msg":"Msg 4: \\Abc123"}""",
      """{"id":3,"msg":"Msg 3: \nAbc123\t\r"}""",
      """{"id":2,"meta":{"lang":"en","score":1.5},"msg":"nested one"}""",
      """{"id":8,"a":{"b":{"c":1},"d":2},"e":3}""",
      """{"id":9,"tags":["a","es"],"ok":true,"none":null}""",
      """{"id":10,"arr":[{"a":999},{"b":1001}]}""",
      """{"f":-1.000000E3,"g":0.000000E+000,"h":5.000000000000001E3}""",
      """{"empty":{},"after":1}""",
      """{}""",
      """5""",
      """"lone"""",
      """[1,2,3]""")
    corpus.foreach { json =>
      assert(JsonShape.reserialize(JsonShape.typedLeaves(json)) == json, json)
    }
  }

  test("reserialize normalizes non-canonical input escapes (reference semantics)") {
    // clp_s reconstructs strings from the *stored decoded value* via
    // escape_json_string (Utils.cpp:166, ColumnReader.cpp:175,222), so
    // redundant source escapes (unicode-escaped ASCII, solidus) come back
    // in canonical form -- reconstruction is value-exact, not
    // source-byte-exact, for non-canonically-escaped input. We match that.
    // (Inputs built with \\ to keep scalac's own unicode pass out of it.)
    val uA = "{\"m\":\"\\u0041\\/B\"}"
    assert(JsonShape.reserialize(JsonShape.typedLeaves(uA)) == """{"m":"A/B"}""")
    // control characters keep an escaped form: \u00xx below 0x20, short
    // forms for \b \t \n \f \r
    val ctl = "{\"m\":\"\\u0001\\u0009\"}"
    assert(JsonShape.reserialize(JsonShape.typedLeaves(ctl)) ==
      "{\"m\":\"\\u0001\\t\"}")
  }

  test("structurize-arrays: StructuredArray node plus element child leaves") {
    val json = """{"arr":[{"a":999},{"b":1001}],"k":1}"""
    val ls = JsonShape.typedLeaves(json, structurizeArrays = true)
    assert(ls.map(l => (l.path, l.nodeType)) == List(
      "arr" -> "StructuredArray",
      "arr.[].a" -> "Integer",
      "arr.[].b" -> "Integer",
      "k" -> "Integer"))
    // the array node still carries the raw text: reconstruction unaffected
    assert(JsonShape.reserialize(ls) == json)
    // scalar and nested-array elements
    val ls2 = JsonShape.typedLeaves("""{"a":[1,"x",[2]]}""", structurizeArrays = true)
    assert(ls2.map(l => (l.path, l.nodeType)).toSet == Set(
      "a" -> "StructuredArray",
      "a.[]" -> "Integer",
      "a.[]" -> "VarString",
      "a.[]" -> "StructuredArray",
      "a.[].[]" -> "Integer"))
    // schema identity is finer-grained than the unstructured default
    val d1 = JsonShape.descriptor("""{"arr":[{"a":1}]}""", structurizeArrays = true)
    val d2 = JsonShape.descriptor("""{"arr":[{"b":1}]}""", structurizeArrays = true)
    assert(d1 != d2)
    assert(JsonShape.descriptor("""{"arr":[{"a":1}]}""") ==
      JsonShape.descriptor("""{"arr":[{"b":1}]}"""))
  }
}

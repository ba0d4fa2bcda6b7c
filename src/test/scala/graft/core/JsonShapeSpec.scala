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

  test("integers beyond int64 type as Float (simdjson double behavior)") {
    assert(JsonShape.leaves("""{"n":99999999999999999999}""") == List("n" -> "Float"))
    assert(JsonShape.leaves(s"""{"n":${Long.MaxValue}}""") == List("n" -> "Integer"))
  }

  test("md5 hex matches the engine convention (lowercase, 32 chars)") {
    assert(JsonShape.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }
}

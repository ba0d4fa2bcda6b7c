package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** kv-IR wire round-trip: schema-tree deltas, typed values, CLP-encoded
  * strings, format-preserving floats. */
class KvIrSpec extends AnyFunSuite {

  private val ev1 = JsonShape.typedLeaves(
    """{"id":1,"msg":"hello big world","k":42,"f":1.500}""")
  private val ev2 = JsonShape.typedLeaves(
    """{"id":2,"msg":"request took 12 ms","ok":true,"x":null,"tags":[1,"a b"]}""")
  private val ev3 = JsonShape.typedLeaves(
    """{"id":-3,"meta":{"lang":"en","deep":{"v":7}},"msg":"nested here now"}""")

  test("events round-trip exactly, including order, types, and values") {
    val bytes = KvIr.serialize(Seq(ev1, ev2, ev3))
    assert(KvIr.deserialize(bytes) == Vector(ev1, ev2, ev3))
  }

  test("float literals keep their exact formatting (FormattedFloat)") {
    val rt = KvIr.deserialize(KvIr.serialize(Seq(ev1))).head
    assert(rt.exists(l => l.path == "f" && l.value == "1.500"))
  }

  test("schema nodes and logtypes transmit once (delta encoding)") {
    val one = KvIr.serialize(Seq(ev1)).length
    val many = KvIr.serialize(Seq.fill(50)(ev1)).length
    // after the first event, repeats carry only ids + values — far below the
    // first event's cost (which includes node paths + the template)
    assert(many - one < 49 * (one - KvIr.Magic.length) / 2)
    assert(KvIr.deserialize(KvIr.serialize(Seq.fill(50)(ev1))).length == 50)
  }

  test("ClpString values CLP-encode on the wire and decode byte-exactly") {
    val tricky = JsonShape.typedLeaves(
      """{"m":"job 0x3f done in 1.25 s with status=failed at node-17"}""")
    assert(KvIr.deserialize(KvIr.serialize(Seq(tricky))) == Vector(tricky))
  }

  test("full int64 range survives the zigzag varint layer") {
    val extremes = JsonShape.typedLeaves(
      s"""{"max":${Long.MaxValue},"min":${Long.MinValue},"z":0,"neg":-1}""")
    assert(KvIr.deserialize(KvIr.serialize(Seq(extremes))) == Vector(extremes))
  }

  test("corrupt input is rejected, not misread") {
    intercept[KvIr.CorruptStream](KvIr.deserialize(Array[Byte]('X', 'K', 'V', '1', 0)))
    val good = KvIr.serialize(Seq(ev1))
    intercept[KvIr.CorruptStream](KvIr.deserialize(good.dropRight(3)))
    // oversized pair count: must err aligned, not truncate-to-int and misread
    val out = new java.io.ByteArrayOutputStream()
    out.write(KvIr.Magic); out.write(KvIr.TagNode); out.write(0) // Integer node
    out.write(1); out.write('a')                                 // path "a"
    out.write(KvIr.TagEvent)
    // varint 2^41-ish pair count (would truncate toInt without the guard)
    Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0x7f).foreach(out.write)
    out.write(KvIr.TagEos)
    intercept[KvIr.CorruptStream](KvIr.deserialize(out.toByteArray))
  }

  test("DateString and StructuredArray leaves ride the wire") {
    val ev = JsonShape.typedLeaves(
      """{"ts":"2024-01-02 03:04:00","arr":[[1],{"k":2}],"msg":"a b c"}""",
      timestampKey = Some("ts"), structurizeArrays = true)
    val back = KvIr.deserialize(KvIr.serialize(Seq(ev))).head
    // value-less [] type markers are schema artifacts, dropped on the wire;
    // every value-bearing leaf round-trips exactly and the record
    // reconstructs byte-for-byte (reserialize skips [] markers identically)
    assert(back == ev.filterNot(_.path.contains("[]")))
    assert(JsonShape.reserialize(back) ==
      """{"ts":"2024-01-02 03:04:00","arr":[[1],{"k":2}],"msg":"a b c"}""")
  }
}

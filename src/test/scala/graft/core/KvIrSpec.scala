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

  test("fuzz: random canonical JSON events round-trip wire + reserialize byte-exactly") {
    // Random nested records built in CANONICAL form (minimal whitespace,
    // escapes exactly as the reserializer emits them), so the contract is
    // json → typedLeaves → serialize → deserialize → reserialize == json
    val rnd = new scala.util.Random(
      sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(0xCAFE5L))
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val keyChars = "abcdefgxyz_"
    def key(): String =
      (0 until 1 + rnd.nextInt(5)).map(_ => keyChars(rnd.nextInt(keyChars.length))).mkString
    def scalar(): String = rnd.nextInt(6) match {
      case 0 => rnd.nextInt(2000000).toString
      case 1 => (-rnd.nextInt(1000)).toString
      case 2 => s"${rnd.nextInt(100)}.${rnd.nextInt(1000)}"   // formatted float
      case 3 => if (rnd.nextBoolean()) "true" else "false"
      case 4 => "null"
      case _ =>
        val w = Seq.fill(1 + rnd.nextInt(4))(key()).mkString(" ") // Clp/VarString
        "\"" + esc(w + (if (rnd.nextBoolean()) "\nnl\\p" else "")) + "\""
    }
    def value(depth: Int): String = rnd.nextInt(8) match {
      case 0 | 1 if depth < 3 => obj(depth + 1)
      case 2 if depth < 3 =>
        "[" + Seq.fill(rnd.nextInt(4))(value(depth + 1)).mkString(",") + "]"
      case _ => scalar()
    }
    def obj(depth: Int): String = {
      val ks = (0 until 1 + rnd.nextInt(4)).map(_ => key()).distinct
      "{" + ks.map(k => "\"" + k + "\":" + value(depth)).mkString(",") + "}"
    }
    val events = Vector.fill(120)(obj(0))
    val leaves = events.map(j => JsonShape.typedLeaves(j))
    val back = KvIr.deserialize(KvIr.serialize(leaves))
    assert(back.size == events.size)
    back.zip(leaves).zip(events).foreach { case ((b, l), j) =>
      assert(b == l, s"wire mismatch for $j")
      assert(JsonShape.reserialize(b) == j, s"reserialize mismatch for $j")
    }
    // structurize mode: value-less [] markers drop on the wire, record
    // content still reconstructs byte-exactly
    val sLeaves = events.map(j => JsonShape.typedLeaves(j, structurizeArrays = true))
    val sBack = KvIr.deserialize(KvIr.serialize(sLeaves))
    sBack.zip(sLeaves).zip(events).foreach { case ((b, l), j) =>
      assert(b == l.filterNot(_.path.contains("[]")))
      assert(JsonShape.reserialize(b) == j, s"structurize reserialize mismatch for $j")
    }
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

package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** IR stream round-trip: serialize(events) |> deserialize reproduces every
  * event exactly — templates, variables (4- and 8-byte int paths, packed
  * floats, inline dict strings), and delta-encoded timestamps (including
  * out-of-order / negative deltas), with byte-exact text after decode. */
class IrStreamSpec extends AnyFunSuite {

  private def roundTrip(msgs: Seq[(Long, String)]): Unit = {
    val events = msgs.map { case (ts, m) => IrStream.IrEvent(ts, ClpEncoding.encode(m)) }
    val back = IrStream.deserialize(IrStream.serialize(events)).toVector
    assert(back.size === events.size)
    back.zip(msgs).foreach { case (ev, (ts, msg)) =>
      assert(ev.tsMs === ts)
      val decoded = ClpEncoding.decode(
        ev.encoded.logtype, ev.encoded.encodedVars, ev.encoded.dictVars)
      assert(decoded === msg)
    }
  }

  test("empty stream") {
    assert(IrStream.deserialize(IrStream.serialize(Nil)).isEmpty)
  }

  test("single event, absolute timestamp") {
    roundTrip(Seq((1700000000123L, "job 42 finished in 1.500 s on node-a7")))
  }

  test("int variables cross the 4-byte/8-byte boundary") {
    roundTrip(Seq(
      (1L, s"small ${Int.MaxValue} edge"),
      (2L, s"big ${Int.MaxValue.toLong + 1} needs eight bytes"),
      (3L, s"negative ${Int.MinValue} and ${Int.MinValue.toLong - 1}"),
      (4L, s"extreme ${Long.MaxValue} ${Long.MinValue + 1}")))
  }

  test("timestamp deltas: forward, zero, and backward") {
    roundTrip(Seq((1000L, "a 1"), (5000L, "b 2"), (5000L, "c 3"),
      (200L, "clock went backwards 4"), (0L, "zero 5")))
  }

  test("escapes and literal placeholder bytes survive") {
    roundTrip(Seq(
      (1L, "literal \u0011 and \u0012 and \u0013 bytes with var 99"),
      (2L, "backslash \\ path C:\\tmp\\f1.log"),
      (3L, "unicode caf\u00e9 \u65e5\u672c\u8a9e with id=ab12cd")))
  }

  test("property: random message batches round-trip byte-exactly") {
    val tok = Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(8)),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.chooseNum(-9999999, 9999999).map(n => (n / 1000.0).toString),
      Gen.oneOf("ERROR", "id=ab3f", "1.500", "007", "+5", "--", "\u0011x", "a\\b"))
    val msg = Gen.listOfN(6, tok).map(_.mkString(" "))
    val batch = Gen.listOfN(5, Gen.zip(Gen.chooseNum(0L, 1L << 45), msg))
    GenCheck.forAll(batch, n = 200)(b => roundTrip(b))
  }

  test("corrupt input is rejected, not misread") {
    intercept[IllegalArgumentException](IrStream.deserialize("nope".getBytes).toVector)
    val good = IrStream.serialize(Seq(IrStream.IrEvent(1L, ClpEncoding.encode("x 1"))))
    val bad = good.clone(); bad(4) = 0x7f.toByte // first tag after magic
    intercept[IllegalArgumentException](IrStream.deserialize(bad).toVector)
  }

  test("truncated streams fail loudly at every cut point, never silently") {
    val good = IrStream.serialize(Seq(
      IrStream.IrEvent(5L, ClpEncoding.encode("job a1b2c3 took 1.5 ms")),
      IrStream.IrEvent(9L, ClpEncoding.encode("done with status=ok"))))
    // any prefix that still passes the magic check must either parse a
    // strict prefix of the events AND throw, or throw immediately — a
    // truncated stream (missing EOS) can never be mistaken for complete
    for (cut <- IrStream.Magic.length + 1 until good.length) {
      intercept[IllegalArgumentException](
        IrStream.deserialize(good.take(cut)).toVector)
    }
  }

  test("compactness: IR stream is smaller than the raw text for typical logs") {
    val msgs = (0 until 1000).map(i =>
      (1700000000000L + i * 250L,
        s"INFO task $i finished in ${i % 97}.${100 + i % 900} ms on host-${i % 8}"))
    val ir = IrStream.serialize(msgs.map { case (ts, m) => IrStream.IrEvent(ts, ClpEncoding.encode(m)) })
    val raw = msgs.map { case (ts, m) => 13 + m.getBytes.length }.sum // 13 ≈ "epoch_ms " prefix
    assert(ir.length < raw)
  }
}

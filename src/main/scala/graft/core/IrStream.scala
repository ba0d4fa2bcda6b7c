package graft.core

import java.io.ByteArrayOutputStream

/** CLP-style IR stream: a compact, self-describing tag-byte serialization of
  * encoded log events — each event is its variables (in log-type placeholder
  * order, each tagged by kind), the log-type template, and a delta-encoded
  * timestamp. This is the wire/stream format the reference uses for
  * real-time ingestion from logging libraries; re-expressed from scratch.
  *
  * Reference semantics (framing, not code):
  * `components/core/src/clp/ffi/ir_stream/protocol_constants.hpp:39-79`
  * (tag-byte protocol, four- vs eight-byte variable encodings, timestamp
  * delta events) and `components/core/src/clp/ir/types.hpp:7-9`.
  *
  * Format (all multi-byte fixed ints big-endian; varints LEB128, deltas
  * zigzag-LEB128):
  *
  * {{{
  * stream  := MAGIC("GIR1") event* TAG_EOS
  * event   := var* logtype ts
  * var     := TAG_INT4 i32 | TAG_INT8 i64          // literal integer var
  *          | TAG_FLOAT i64                        // packed decimal float
  *          | TAG_DICT varint(len) utf8-bytes      // dictionary var (inline)
  * logtype := TAG_LOGTYPE varint(len) utf8-bytes   // also defines dict id
  *          | TAG_LOGTYPE_REF varint(id)            // ref to earlier template
  *                                                  // (stream-local dictionary,
  *                                                  // mirrored by the reader)
  * ts      := TAG_TS_ABS i64                       // first event: absolute ms
  *          | TAG_TS_DELTA zigzag-varint           // later events: delta ms
  * }}}
  *
  * Variable tags reuse the placeholder-byte convention (0x11/0x12/0x13) so a
  * reader can map tags straight onto template placeholders.
  */
object IrStream {

  final val Magic: Array[Byte] = Array('G', 'I', 'R', '1').map(_.toByte)

  final val TagEos: Byte = 0x00
  final val TagInt8: Byte = 0x11     // matches ClpEncoding.IntPlaceholder
  final val TagDict: Byte = 0x12     // matches ClpEncoding.DictPlaceholder
  final val TagFloat: Byte = 0x13    // matches ClpEncoding.FloatPlaceholder
  final val TagInt4: Byte = 0x14     // compact four-byte integer encoding
  final val TagLogtype: Byte = 0x20    // inline template; defines next dict id
  final val TagLogtypeRef: Byte = 0x21 // varint ref to a previously-defined id
  final val TagTsAbs: Byte = 0x30
  final val TagTsDelta: Byte = 0x31

  final case class IrEvent(tsMs: Long, encoded: ClpEncoding.Encoded)

  // ---- serialize ----

  def serialize(events: IterableOnce[IrEvent]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    out.write(Magic, 0, Magic.length)
    var prevTs = 0L
    var first = true
    val ltDict = new java.util.HashMap[String, Integer]()
    val it = events.iterator
    while (it.hasNext) {
      val ev = it.next()
      writeEvent(out, ev, first, prevTs, ltDict)
      prevTs = ev.tsMs
      first = false
    }
    out.write(TagEos)
    out.toByteArray
  }

  private def writeEvent(out: ByteArrayOutputStream, ev: IrEvent,
                         first: Boolean, prevTs: Long,
                         ltDict: java.util.HashMap[String, Integer]): Unit = {
    val lt = ev.encoded.logtype
    var encIx = 0
    var dictIx = 0
    var i = 0
    // walk the template: placeholder order defines variable order on the wire
    while (i < lt.length) {
      val c = lt.charAt(i)
      if (c == ClpEncoding.EscapeChar && i + 1 < lt.length) {
        i += 1 // escaped literal — not a placeholder
      } else if (c == ClpEncoding.IntPlaceholder) {
        val v = ev.encoded.encodedVars(encIx); encIx += 1
        if (v >= Int.MinValue && v <= Int.MaxValue) {
          out.write(TagInt4); writeI32(out, v.toInt)
        } else {
          out.write(TagInt8); writeI64(out, v)
        }
      } else if (c == ClpEncoding.FloatPlaceholder) {
        val v = ev.encoded.encodedVars(encIx); encIx += 1
        out.write(TagFloat); writeI64(out, v)
      } else if (c == ClpEncoding.DictPlaceholder) {
        val s = ev.encoded.dictVars(dictIx); dictIx += 1
        out.write(TagDict); writeString(out, s)
      }
      i += 1
    }
    val ref = ltDict.get(lt)
    if (ref == null) {
      ltDict.put(lt, ltDict.size())
      out.write(TagLogtype); writeString(out, lt)
    } else {
      out.write(TagLogtypeRef); writeVarint(out, ref.longValue())
    }
    if (first) { out.write(TagTsAbs); writeI64(out, ev.tsMs) }
    else { out.write(TagTsDelta); writeZigzagVarint(out, ev.tsMs - prevTs) }
  }

  // ---- deserialize ----

  /** Streaming reader: decodes events lazily, so a consumer can stop early
    * (e.g. a search with a limit) without materializing the whole stream. */
  def deserialize(bytes: Array[Byte]): Iterator[IrEvent] = {
    require(bytes.length >= Magic.length + 1 &&
      java.util.Arrays.equals(bytes, 0, Magic.length, Magic, 0, Magic.length),
      "not a GIR1 IR stream")
    new Iterator[IrEvent] {
      private var pos = Magic.length
      private var prevTs = 0L
      private val ltDict = scala.collection.mutable.ArrayBuffer.empty[String]
      private var done = bytes(pos) == TagEos

      override def hasNext: Boolean = !done

      override def next(): IrEvent = {
        if (done) throw new NoSuchElementException("past end of IR stream")
        val encVars = Array.newBuilder[Long]
        val dictVars = Array.newBuilder[String]
        var logtype: String = null
        while (logtype == null) {
          val tag = u8().toByte
          tag match {
            case TagInt4 => encVars += readI32(); case TagInt8 => encVars += readI64()
            case TagFloat => encVars += readI64()
            case TagDict => dictVars += readString()
            case TagLogtype => logtype = readString(); ltDict += logtype
            case TagLogtypeRef =>
              val ref = readVarint()
              if (ref < 0 || ref >= ltDict.length.toLong)
                throw new IllegalArgumentException(s"bad logtype ref $ref at $pos")
              logtype = ltDict(ref.toInt)
            case t => throw new IllegalArgumentException(
              f"bad IR tag 0x$t%02x at ${pos - 1}")
          }
        }
        val ts = u8().toByte match {
          case TagTsAbs => readI64()
          case TagTsDelta => prevTs + readZigzagVarint()
          case t => throw new IllegalArgumentException(
            f"expected timestamp tag, got 0x$t%02x at ${pos - 1}")
        }
        prevTs = ts
        // a stream that ends without its EOS tag is truncated, not complete
        if (pos >= bytes.length)
          throw new IllegalArgumentException(s"missing EOS tag at $pos")
        if (bytes(pos) == TagEos) done = true
        IrEvent(ts, ClpEncoding.Encoded(logtype, dictVars.result(), encVars.result()))
      }

      // corrupt/truncated streams must fail loudly and aligned, never
      // silently misparse (the same hardening as KvIr.deserialize)
      private def u8(): Int = {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(s"truncated IR stream at $pos")
        val b = bytes(pos) & 0xff; pos += 1; b
      }
      private def readI32(): Long = {
        var v = 0; var k = 0
        while (k < 4) { v = (v << 8) | u8(); k += 1 }
        v.toLong
      }
      private def readI64(): Long = {
        var v = 0L; var k = 0
        while (k < 8) { v = (v << 8) | u8().toLong; k += 1 }
        v
      }
      private def readVarint(): Long = {
        var v = 0L; var shift = 0
        var b = u8()
        while ((b & 0x80) != 0) {
          v |= (b & 0x7fL) << shift; shift += 7
          // a 10-byte varint's final byte lands at shift 63; a continuation
          // past 64 bits is corrupt
          if (shift > 63) throw new IllegalArgumentException(
            s"varint overflow at $pos")
          b = u8()
        }
        v | ((b & 0x7fL) << shift)
      }
      private def readZigzagVarint(): Long = {
        val u = readVarint(); (u >>> 1) ^ -(u & 1)
      }
      private def readString(): String = {
        // validate the 64-bit length against the remaining bytes BEFORE the
        // toInt narrow — 2^32 would truncate to 0 and silently misalign
        val len64 = readVarint()
        if (len64 < 0 || len64 > (bytes.length - pos).toLong)
          throw new IllegalArgumentException(s"bad string length $len64 at $pos")
        val len = len64.toInt
        val s = new String(bytes, pos, len, java.nio.charset.StandardCharsets.UTF_8)
        pos += len
        s
      }
    }
  }

  // ---- little encoders ----

  private def writeI32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v >>> 24); out.write(v >>> 16); out.write(v >>> 8); out.write(v)
  }
  private def writeI64(out: ByteArrayOutputStream, v: Long): Unit = {
    writeI32(out, (v >>> 32).toInt); writeI32(out, v.toInt)
  }
  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeZigzagVarint(out: ByteArrayOutputStream, v: Long): Unit =
    writeVarint(out, (v << 1) ^ (v >> 63))
  private def writeString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }
}

package graft.core

import java.io.ByteArrayOutputStream

/**
 * kv-IR: a structured (key-value) IR stream — the streaming twin of the
 * clp_s archive, re-expressed from scratch. A stream interleaves
 * schema-tree deltas (each typed node transmitted ONCE, on first use) with
 * events whose pairs reference node ids; ClpString values are CLP-encoded
 * on the wire (stream-local logtype dictionary + tagged variables), floats
 * keep their exact literal formatting (the FormattedFloat idea).
 *
 * Reference semantics (framing, not code):
 * `components/core/src/clp/ffi/ir_stream/protocol_constants.hpp:63-79`
 * (kv-IR unit tags: schema-tree node insertions vs key-value events),
 * `components/core/src/clp/ffi/KeyValuePairLogEvent.hpp`,
 * `components/core/src/clp/ffi/SchemaTree.hpp`. Simplification vs the
 * reference: nodes are keyed by full dotted path rather than
 * (parent-id, key) pairs — same delta property, flat dictionary.
 *
 * {{{
 * stream  := MAGIC("GKV1") unit* TAG_EOS
 * unit    := TAG_NODE type-byte varint(len) path-utf8   // id = insert order
 *          | TAG_EVENT varint(nPairs) pair*
 * pair    := varint(node_id) value
 * value   := Integer:  zigzag-varint
 *          | Float:    varint(len) literal-utf8          // format-preserving
 *          | Boolean:  1 byte     | NullValue: (none)    | Object: (none)
 *          | VarString | UnstructuredArray: varint(len) utf8
 *          | ClpString: varint(k) [k==0 → varint(len) template-utf8, defines
 *                       next logtype id; k>0 → ref id k-1] then per template
 *                       placeholder: int → zigzag-varint, float → 8-byte
 *                       packed long, dict → varint(len) utf8
 * }}}
 */
object KvIr {

  final val Magic: Array[Byte] = Array('G', 'K', 'V', '1').map(_.toByte)
  final val TagEos: Byte = 0x00
  final val TagNode: Byte = 0x01
  final val TagEvent: Byte = 0x02

  /** Node-type wire bytes, index = byte value (append-only: existing byte
    * assignments are wire format). */
  final val Types: Vector[String] = Vector(
    "Integer", "Float", "Boolean", "NullValue", "VarString", "ClpString",
    "UnstructuredArray", "Object", "FormattedFloat", "DictionaryFloat",
    "DateString", "StructuredArray")
  private val TypeIx: Map[String, Int] = Types.zipWithIndex.toMap

  final case class CorruptStream(msg: String) extends RuntimeException(msg)

  // ---- LEB128 helpers (full unsigned-64 range: a zigzagged Long.MinValue
  // arrives with bit 63 set, i.e. as a negative Long — the unsigned shift
  // loop emits it as the standard 10-byte varint) ----
  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeZigzag(out: ByteArrayOutputStream, v: Long): Unit =
    writeVarint(out, (v << 1) ^ (v >> 63))
  private def writeStr(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  // ---- serialize ----

  def serialize(events: IterableOnce[List[JsonShape.Leaf]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    out.write(Magic, 0, Magic.length)
    val nodeIds = new java.util.HashMap[(String, String), Integer]()
    val ltIds = new java.util.HashMap[String, Integer]()
    val it = events.iterator
    while (it.hasNext) {
      // structurize child leaves ([] path segments) are value-less TYPE
      // markers with no JSON content of their own — the array node carries
      // the full raw text; an Integer-typed marker would otherwise crash
      // "".toLong below. (Real keys cannot contain '[': JsonShape refuses.)
      val leavesList = it.next().filterNot(_.path.contains("[]"))
      // schema-tree deltas first: any unseen (path, type) node
      leavesList.foreach { l =>
        val key = (l.path, l.nodeType)
        if (!nodeIds.containsKey(key)) {
          nodeIds.put(key, nodeIds.size())
          out.write(TagNode)
          out.write(TypeIx.getOrElse(l.nodeType,
            throw new IllegalArgumentException(s"unknown node type ${l.nodeType}")))
          writeStr(out, l.path)
        }
      }
      out.write(TagEvent)
      writeVarint(out, leavesList.length.toLong)
      leavesList.foreach { l =>
        writeVarint(out, nodeIds.get((l.path, l.nodeType)).longValue())
        l.nodeType match {
          case "Integer" => writeZigzag(out, l.value.toLong)
          case "Float" | "DictionaryFloat" => writeStr(out, l.value) // literal text
          case "FormattedFloat" =>
            // (double, 16-bit format word) — the compact clp_s encoding;
            // encodability was proven at typing time
            val (v, f) = FloatFormat.encode(l.value).getOrElse(
              throw new IllegalArgumentException(s"unencodable FormattedFloat '${l.value}'"))
            val bits = java.lang.Double.doubleToLongBits(v)
            var k = 56
            while (k >= 0) { out.write(((bits >>> k) & 0xff).toInt); k -= 8 }
            out.write((f >> 8) & 0xff); out.write(f & 0xff)
          case "Boolean" => out.write(if (l.value == "true") 1 else 0)
          case "NullValue" | "Object" => ()
          case "VarString" | "UnstructuredArray" | "DateString" | "StructuredArray" =>
            writeStr(out, l.value)
          case "ClpString" =>
            val enc = ClpEncoding.encode(l.value)
            val ref = ltIds.get(enc.logtype)
            if (ref == null) {
              ltIds.put(enc.logtype, ltIds.size())
              writeVarint(out, 0L)
              writeStr(out, enc.logtype)
            } else writeVarint(out, ref.longValue() + 1)
            writeClpVars(out, enc)
        }
      }
    }
    out.write(TagEos)
    out.toByteArray
  }

  private def writeClpVars(out: ByteArrayOutputStream, enc: ClpEncoding.Encoded): Unit = {
    val lt = enc.logtype
    var encIx = 0
    var dictIx = 0
    var i = 0
    while (i < lt.length) {
      val c = lt.charAt(i)
      if (c == ClpEncoding.EscapeChar) i += 2
      else {
        if (c == ClpEncoding.IntPlaceholder) {
          writeZigzag(out, enc.encodedVars(encIx)); encIx += 1
        } else if (c == ClpEncoding.FloatPlaceholder) {
          val v = enc.encodedVars(encIx); encIx += 1
          var k = 56
          while (k >= 0) { out.write(((v >>> k) & 0xff).toInt); k -= 8 }
        } else if (c == ClpEncoding.DictPlaceholder) {
          writeStr(out, enc.dictVars(dictIx)); dictIx += 1
        }
        i += 1
      }
    }
  }

  // ---- deserialize ----

  def deserialize(bytes: Array[Byte]): Vector[List[JsonShape.Leaf]] = {
    var i = 0
    val n = bytes.length
    def err(m: String): Nothing = throw CorruptStream(s"$m at $i")
    def u8(): Int = { if (i >= n) err("truncated"); val b = bytes(i) & 0xff; i += 1; b }
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = u8()
        v |= (b & 0x7fL) << shift
        shift += 7
        // a 10-byte varint's final byte lands at shift 63; only a
        // CONTINUATION past 64 bits is corrupt
        if (shift > 63 && (b & 0x80) != 0) err("varint overflow")
      } while ((b & 0x80) != 0)
      v
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def str(): String = {
      // validate the 64-bit varint against the remaining bytes BEFORE the
      // toInt narrow — e.g. 2^32 would otherwise truncate to 0 (silent
      // misalignment) and i + len could overflow Int past the bounds check
      val len64 = varint()
      if (len64 < 0 || len64 > (n - i).toLong) err("bad string length")
      val len = len64.toInt
      val s = new String(bytes, i, len, java.nio.charset.StandardCharsets.UTF_8)
      i += len
      s
    }

    if (n < 4 || bytes(0) != 'G' || bytes(1) != 'K' || bytes(2) != 'V' || bytes(3) != '1')
      err("bad magic")
    i = 4
    val nodes = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val lts = scala.collection.mutable.ArrayBuffer.empty[String]
    val events = Vector.newBuilder[List[JsonShape.Leaf]]
    var done = false
    while (!done) {
      u8() match {
        case 0x00 => done = true
        case 0x01 =>
          val t = u8()
          if (t >= Types.length) err(s"bad node type $t")
          nodes += ((str(), Types(t)))
        case 0x02 =>
          // validate BEFORE narrowing: a 2^32+5 pair count would truncate to
          // 5 and silently under-read (each pair is ≥1 byte, so remaining
          // bytes bound the honest maximum)
          val nPairs64 = varint()
          if (nPairs64 < 0 || nPairs64 > (n - i).toLong) err(s"bad pair count $nPairs64")
          val nPairs = nPairs64.toInt
          val pairs = List.newBuilder[JsonShape.Leaf]
          var p = 0
          while (p < nPairs) {
            val nid64 = varint()
            if (nid64 < 0 || nid64 >= nodes.length.toLong) err(s"bad node id $nid64")
            val nid = nid64.toInt
            val (path, tpe) = nodes(nid)
            val value = tpe match {
              case "Integer" => zigzag().toString
              case "Float" | "DictionaryFloat" => str()
              case "FormattedFloat" =>
                var bits = 0L
                var k8 = 0
                while (k8 < 8) { bits = (bits << 8) | u8().toLong; k8 += 1 }
                val f = (u8() << 8) | u8()
                FloatFormat.restore(java.lang.Double.longBitsToDouble(bits), f)
              case "Boolean" => if (u8() != 0) "true" else "false"
              case "NullValue" => "null"
              case "Object" => "{}"
              case "VarString" | "UnstructuredArray" | "DateString" | "StructuredArray" =>
                str()
              case "ClpString" =>
                val k = varint()
                val lt =
                  if (k == 0) { val t0 = str(); lts += t0; t0 }
                  else {
                    // k is unsigned on the wire; a 10-byte varint can land
                    // negative here and would pass `< length` unchecked
                    if (k < 0 || k - 1 >= lts.length.toLong) err(s"bad logtype ref ${k - 1}")
                    lts((k - 1).toInt)
                  }
                val encVars = scala.collection.mutable.ArrayBuffer.empty[Long]
                val dictVars = scala.collection.mutable.ArrayBuffer.empty[String]
                var j = 0
                while (j < lt.length) {
                  val c = lt.charAt(j)
                  if (c == ClpEncoding.EscapeChar) j += 2
                  else {
                    if (c == ClpEncoding.IntPlaceholder) encVars += zigzag()
                    else if (c == ClpEncoding.FloatPlaceholder) {
                      var v = 0L
                      var k8 = 0
                      while (k8 < 8) { v = (v << 8) | u8().toLong; k8 += 1 }
                      encVars += v
                    } else if (c == ClpEncoding.DictPlaceholder) dictVars += str()
                    j += 1
                  }
                }
                ClpEncoding.decode(lt, encVars.toArray, dictVars.toArray)
            }
            pairs += JsonShape.Leaf(path, tpe, value)
            p += 1
          }
          events += pairs.result()
        case t => err(s"bad unit tag $t")
      }
    }
    events.result()
  }
}

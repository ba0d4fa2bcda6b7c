package graft.tools
import graft.core.ClpEncoding
import graft.pipeline.TranscriptGen
/** Dev-only: raw single-thread encode/decode throughput. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val msgs = (0 until 100000).map(i => TranscriptGen.renderText(i % 50, i.toLong * 7919))
    var x = 0L
    for (_ <- 0 until 3; m <- msgs) x += ClpEncoding.encode(m).logtype.length
    val t0 = System.nanoTime()
    for (_ <- 0 until 5; m <- msgs) x += ClpEncoding.encode(m).logtype.length
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"encode: ${500000 / sec}%.0f msgs/s single-thread ($x)")
    val encs = msgs.map(ClpEncoding.encode)
    val t1 = System.nanoTime()
    for (_ <- 0 until 5; e <- encs) x += ClpEncoding.decode(e.logtype, e.encodedVars, e.dictVars).length
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"decode: ${500000 / sec2}%.0f msgs/s single-thread ($x)")
  }
}

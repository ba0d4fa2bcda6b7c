package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.{ClpEncoding, IrStream}
import graft.pipeline.TranscriptGen
import graft.streaming.StreamingPipeline

/** End-to-end IR ingestion demo: producers emit per-conversation `.gir` IR
  * streams; the binary-file streaming source deserializes them and the
  * micro-batch pipeline encodes, builds dictionaries, and routes. Prints the
  * routed/decoded summary. Usage: runMain graft.tools.IrIngestDemo [nConvs]
  */
object IrIngestDemo {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toInt else 50
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-ir-ingest")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)

    val srcDir = Files.createTempDirectory("ir-demo-src").toString
    val outDir = Files.createTempDirectory("ir-demo-out").toString
    val ckpt = Files.createTempDirectory("ir-demo-ckpt").toString

    var rawBytes = 0L
    var irBytes = 0L
    (0L until nConvs.toLong).foreach { c =>
      val turns = (0 until 8).map(ix => TranscriptGen.turnAt(c, ix, seed = 99L))
      val blob = IrStream.serialize(turns.map(t =>
        IrStream.IrEvent(t.ts.getTime, ClpEncoding.encode(t.text))))
      rawBytes += turns.map(_.text.getBytes.length + 13).sum
      irBytes += blob.length
      Files.write(Paths.get(srcDir, f"conv$c%05d.gir"), blob)
    }

    new StreamingPipeline(spark, outDir)
      .start(StreamingPipeline.irFileSource(spark, srcDir), ckpt)
      .processAllAvailable()

    val routed = spark.read.parquet(s"$outDir/routed")
    val sinks = routed.groupBy("sink_id").count().orderBy("sink_id").collect()
    println(s"ir-ingest: ${nConvs * 8} events in ${nConvs} streams; " +
      f"ir/raw size = ${irBytes.toDouble / rawBytes}%.3f")
    println(s"routed rows = ${routed.count()} across ${sinks.length} sinks: " +
      sinks.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    spark.stop()
  }
}

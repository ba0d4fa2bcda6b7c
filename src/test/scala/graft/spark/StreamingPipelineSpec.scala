package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{ClpPipeline, TranscriptGen, Turn}
import graft.streaming.StreamingPipeline

/** Streaming ingestion: two micro-batches through the encode+route path —
  * dictionary IDs stay monotone across batches, all rows are routed, and the
  * decode round-trip holds on the streamed archive. */
class StreamingPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("micro-batches ingest with monotone dictionaries and byte-exact decode") {
    val outDir = Files.createTempDirectory("graft-stream-pipe").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val engine = new StreamingPipeline(spark, outDir)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Turn]
    val batch1 = (0L until 60L).map(c => TranscriptGen.turnAt(c, 0, seed = 11L))
    val batch2 = (60L until 120L).map(c => TranscriptGen.turnAt(c, 0, seed = 11L))

    source.addData(batch1)
    engine.start(source.toDF(), ckpt).processAllAvailable()
    val vd1 = spark.read.parquet(s"$outDir/var_dict")
      .as[(Long, String)].collect().toMap
    source.addData(batch2)
    engine.start(source.toDF(), ckpt).processAllAvailable()

    val routed = spark.read.parquet(s"$outDir/routed")
    assert(routed.count() == 120)
    assert(routed.select("batch_id").distinct().count() >= 2)

    // IDs from batch 1 unchanged after batch 2 (monotone growth)
    val vd2 = spark.read.parquet(s"$outDir/var_dict").as[(Long, String)].collect().toMap
    vd1.foreach { case (id, v) => assert(vd2(id) == v) }
    assert(vd2.size >= vd1.size)

    // byte-exact decode of the streamed archive
    val lts = spark.read.parquet(s"$outDir/logtype_dict")
    val inv: Map[Long, String] = vd2
    val bcInv = spark.sparkContext.broadcast(inv)
    val dictValsOf = udf((logtype: String, vars: Seq[Long]) => {
      ClpPipeline.placeholderKinds(logtype).iterator.zip(vars.iterator)
        .collect { case ('d', v) => bcInv.value(v) }.toSeq
    })
    val encValsOf = udf((logtype: String, vars: Seq[Long]) => {
      ClpPipeline.placeholderKinds(logtype).iterator.zip(vars.iterator)
        .collect { case (k, v) if k != 'd' => v }.toSeq
    })
    val decoded = routed.join(broadcast(lts), Seq("logtype_id"))
      .withColumn("text", graft.functions.ClpFunctions.clp_decode(col("logtype"),
        encValsOf(col("logtype"), col("vars")), dictValsOf(col("logtype"), col("vars"))))
      .select("conv_id", "turn_idx", "text")
    val original = (batch1 ++ batch2).map(t => (t.conv_id, t.turn_idx) -> t.text).toMap
    decoded.collect().foreach { r =>
      assert(original((r.getString(0), r.getInt(1))) == r.getString(2))
    }
  }

  test("replayed micro-batch ids are idempotent (at-least-once → exactly-once)") {
    val outDir = Files.createTempDirectory("graft-stream-replay").toString
    val engine = new StreamingPipeline(spark, outDir)
    val batch = (0L until 40L).map(c => TranscriptGen.turnAt(c, 0, seed = 17L)).toDF
    engine.processBatch(batch, 0L)
    val n1 = spark.read.parquet(s"$outDir/routed").count()
    // foreachBatch replays the same batch id after a failure — must not append
    engine.processBatch(batch, 0L)
    assert(spark.read.parquet(s"$outDir/routed").count() == n1)
    // a NEW id still appends
    engine.processBatch(batch, 1L)
    assert(spark.read.parquet(s"$outDir/routed").count() == 2 * n1)
  }

  test("IR-file streaming source: binary .gir streams feed the pipeline") {
    val srcDir = Files.createTempDirectory("graft-ir-src").toString
    val outDir = Files.createTempDirectory("graft-ir-out").toString
    val ckpt = Files.createTempDirectory("graft-ir-ckpt").toString

    // producer side: each conversation's turns serialized as one IR stream
    val convs = (0L until 20L).map { c =>
      val turns = (0 until 5).map(ix => TranscriptGen.turnAt(c, ix, seed = 13L))
      val blob = graft.core.IrStream.serialize(turns.map(t =>
        graft.core.IrStream.IrEvent(t.ts.getTime, graft.core.ClpEncoding.encode(t.text))))
      Files.write(java.nio.file.Paths.get(srcDir, f"conv$c%04d.gir"), blob)
      c -> turns
    }.toMap

    val engine = new StreamingPipeline(spark, outDir)
    engine.start(StreamingPipeline.irFileSource(spark, srcDir), ckpt)
      .processAllAvailable()

    val routed = spark.read.parquet(s"$outDir/routed")
    assert(routed.count() == 100)

    // the wire format carried everything: texts round-trip byte-exactly
    val lts = spark.read.parquet(s"$outDir/logtype_dict")
    val inv = spark.read.parquet(s"$outDir/var_dict").as[(Long, String)].collect().toMap
    val bcInv = spark.sparkContext.broadcast(inv)
    val dictValsOf = udf((logtype: String, vars: Seq[Long]) => {
      ClpPipeline.placeholderKinds(logtype).iterator.zip(vars.iterator)
        .collect { case ('d', v) => bcInv.value(v) }.toSeq
    })
    val encValsOf = udf((logtype: String, vars: Seq[Long]) => {
      ClpPipeline.placeholderKinds(logtype).iterator.zip(vars.iterator)
        .collect { case (k, v) if k != 'd' => v }.toSeq
    })
    val decoded = routed.join(broadcast(lts), Seq("logtype_id"))
      .withColumn("text", graft.functions.ClpFunctions.clp_decode(col("logtype"),
        encValsOf(col("logtype"), col("vars")), dictValsOf(col("logtype"), col("vars"))))
      .select("conv_id", "turn_idx", "text")
    decoded.collect().foreach { r =>
      val conv = r.getString(0).stripPrefix("conv").toLong
      assert(convs(conv)(r.getInt(1)).text == r.getString(2))
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{ClpPipeline, TranscriptGen}

/**
 * Structured-Streaming ingestion — the reference's real-time IR path
 * (components/core/src/clp/ffi/ir_stream/Serializer.cpp; SURVEY §2.7 W3/W5)
 * re-expressed as readStream → clp_encode → foreachBatch {merge dictionary
 * delta, route append}.
 *
 * Dictionary state grows monotonically across batches exactly like the
 * reference's single-writer in-memory dicts: within a batch, new values are
 * sorted before ID assignment (deterministic); across batches, IDs continue
 * from the current max — so replaying the same batch sequence reproduces the
 * same dictionary (the streaming twin of the batch determinism rule).
 */
final class StreamingPipeline(spark: SparkSession, outDir: String) {

  /** Dictionary state cached across micro-batches in this engine instance —
    * the streaming twin of the reference's memory-resident writer dicts;
    * re-hydrated from parquet once on the first batch (and after restart),
    * not re-collected per batch. */
  private var dictState: Option[(Map[String, Long], Map[String, Long])] = None

  /** Merges a micro-batch of turns; returns rows appended.
    *
    * Idempotent under foreachBatch's at-least-once replay: a committed batch
    * leaves a `_batches/<id>` marker (written only after the routed append
    * succeeds), and a replayed id returns early instead of appending
    * duplicates — the micro-batch twin of the batch pipeline's per-stage
    * lineage manifests. A crash in the window between the append and the
    * marker replays the batch and CAN leave a duplicate copy of its rows;
    * because the dict merge is monotone and the batch content identical,
    * the duplicates are byte-identical rows under the same
    * (conv_id, turn_idx) key — [[readRouted]] collapses them exactly-once. */
  def processBatch(turns: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    val marker = new java.io.File(s"$outDir/_batches/$batchId")
    if (marker.exists()) return
    val parsed = ClpPipeline.parse(turns)
      // a batch is small: localCheckpoint would pin executors in streaming;
      // just materialize via cache for the two passes below
      .cache()

    // ---- dictionary deltas (var + logtype), monotone IDs ----
    val varDictPath = s"$outDir/var_dict"
    val ltDictPath = s"$outDir/logtype_dict"
    val haveDicts = new java.io.File(s"$varDictPath/_SUCCESS").exists()
    val (oldVars, oldLts) = dictState.getOrElse {
      if (haveDicts)
        (spark.read.parquet(varDictPath).select("value", "var_id").as[(String, Long)].collect().toMap,
         spark.read.parquet(ltDictPath).select("logtype", "logtype_id").as[(String, Long)].collect().toMap)
      else (Map.empty[String, Long], Map.empty[String, Long])
    }

    val newVarValues = parsed.select(explode(col("dict_vars")).as("value"))
      .distinct().as[String].collect().filterNot(oldVars.contains).sorted
    val newLtValues = parsed.select(col("logtype")).distinct().as[String]
      .collect().filterNot(oldLts.contains).sorted

    val varBase = if (oldVars.isEmpty) 0L else oldVars.values.max + 1
    val ltBase = if (oldLts.isEmpty) 0L else oldLts.values.max + 1
    val vars = oldVars ++ newVarValues.zipWithIndex.map { case (v, i) => v -> (varBase + i) }
    val lts = oldLts ++ newLtValues.zipWithIndex.map { case (v, i) => v -> (ltBase + i) }

    if (newVarValues.nonEmpty || !haveDicts)
      vars.toSeq.map { case (v, id) => (id, v) }.toDF("var_id", "value")
        .coalesce(1).write.mode("overwrite").parquet(varDictPath)
    if (newLtValues.nonEmpty || !haveDicts)
      lts.toSeq.map { case (v, id) => (id, v) }.toDF("logtype_id", "logtype")
        .coalesce(1).write.mode("overwrite").parquet(ltDictPath)
    dictState = Some((vars, lts))

    // ---- encode + route append (sink = logtype_id % 16 for the stream) ----
    val bcVars = spark.sparkContext.broadcast(vars)
    val bcLts = spark.sparkContext.broadcast(lts)
    val resolve = udf((logtype: String, dictVars: Seq[String], encodedVars: Seq[Long]) => {
      val ltId = bcLts.value(logtype)
      val ids = dictVars.map(bcVars.value(_)).toArray
      (ltId, (ltId % 16).toInt,
        graft.core.ClpEncoding.mergeVars(logtype, encodedVars.toArray, ids))
    })
    parsed
      .withColumn("e", resolve(col("logtype"), col("dict_vars"), col("encoded_vars")))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("ts"),
        col("n_bytes"), col("e._1").as("logtype_id"), col("e._2").as("sink_id"),
        col("e._3").as("vars"), lit(batchId).as("batch_id"))
      .write.mode("append").partitionBy("sink_id").parquet(s"$outDir/routed")
    parsed.unpersist()
    marker.mkdirs()
  }

  /** Exactly-once view of the routed stream: collapses the byte-identical
    * duplicates a crash-between-append-and-marker replay can leave (the
    * stable key is unique per turn; replayed rows are identical copies). */
  def readRouted(): DataFrame =
    spark.read.parquet(s"$outDir/routed")
      .dropDuplicates("conv_id", "turn_idx")

  /** Wires a streaming source of turns into the pipeline. */
  def start(turnsStream: DataFrame, checkpointDir: String): StreamingQuery =
    turnsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id))
      .start()
}

object StreamingPipeline {

  /** The reference's real-time ingestion source: logging libraries emit CLP
    * IR streams as files/objects; this reads them with the binary-file
    * streaming source and deserializes each stream back into turn rows
    * (SURVEY §2.1 S5). One file = one producer's stream; the file stem is
    * its conversation id, event order its turn index — decode happens here
    * so the downstream pipeline re-encodes, proving the wire format carries
    * everything the engine needs. */
  def irFileSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.gir")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val convId = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".gir")
        graft.core.IrStream.deserialize(bytes).zipWithIndex.map { case (ev, ix) =>
          graft.pipeline.Turn(convId, ix, "log",
            graft.core.ClpEncoding.decode(
              ev.encoded.logtype, ev.encoded.encodedVars, ev.encoded.dictVars),
            "ir", new java.sql.Timestamp(ev.tsMs))
        }
      }
      .toDF
  }
}

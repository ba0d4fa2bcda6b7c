package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{ClpPipeline, TranscriptGen}

/** Dev-only: quantify GLT's column-oriented variable layout
  * (components/core/src/glt/streaming_archive/writer/LogtypeTable.cpp —
  * variables of the same POSITION stored contiguously, the source of GLT's
  * published 1.24x compression edge over row-wise CLP) against our current
  * row-wise `vars array<long>` column, on the same routed archive bytes.
  *
  * Args: `[turns] [codec] [level]` (defaults 4M, zstd, 3). Prints the routed
  * bytes under both layouts; the exploded layout pads ragged rows with null
  * (parquet stores definition levels, not values, for those). */
object VarLayoutProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val codec = if (args.length > 1) args(1) else "zstd"
    val level = if (args.length > 2) args(2) else "3"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark" else
          System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)

    val pq = Map("compression" -> codec,
      "parquet.compression.codec.zstd.level" -> level)
    val out = Files.createTempDirectory("graft-varlayout").toString
    val turns = TranscriptGen.turns(spark, n, seed = 42L, partitions = 32).toDF
    ClpPipeline.run(spark, turns,
      ClpPipeline.Config(out, maxSinks = 64, saltParts = 64, parquetOptions = pq))

    def dirBytes(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOf(new java.io.File(p))
    val routed = spark.read.parquet(s"$out/routed")
    val maxVars = routed.agg(max(size(col("vars")))).head.getInt(0)
    println(s"rowwise routed bytes = ${dirBytes(s"$out/routed") / 1e6} MB (maxVars=$maxVars)")

    // GLT layout: vars exploded to per-position top-level columns; same
    // partitioning/sort as route() so the comparison is purely the layout
    val exploded = routed
      .select(Seq(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("ts"), col("team"), col("cost_class"), col("n_bytes"),
        col("logtype_id"), col("sink_id")) ++
        (0 until maxVars).map(i => expr(s"get(vars, $i)").as(s"v_$i")): _*)
    val colDir = s"$out/routed_columnar"
    exploded
      .repartition(16, col("sink_id"), pmod(xxhash64(col("conv_id")), lit(8)))
      .sortWithinPartitions("sink_id", "conv_id", "turn_idx")
      .write.mode("overwrite").options(pq).partitionBy("sink_id").parquet(colDir)
    println(s"columnar routed bytes = ${dirBytes(colDir) / 1e6} MB")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.stop()
  }
}

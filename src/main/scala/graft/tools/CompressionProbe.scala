package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{ClpPipeline, TranscriptGen}

/** Dev-only: archive compression ratio on the synthetic transcript corpus —
  * the reference's headline metric (README.md:16-35 benchmark figures). Raw
  * bytes are the rendered log lines (`<ts> <role> <text>\n`, the same lines
  * `RawLogIngest` parses and `Extract` reconstructs); archive bytes are the
  * routed archive directory on disk (dictionaries + encoded columns + stats).
  * Args: `[turns] [codec] [zstdLevel] [writerVersion]` — e.g.
  * `4000000 zstd 9 v2` measures the archival profile (zstd level 9 +
  * parquet v2 delta page encodings via `Config.parquetOptions`); defaults
  * are the throughput profile (`snappy`, level n/a, v1). */
object CompressionProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val codec = if (args.length > 1) args(1) else "snappy"
    val zstdLevel = if (args.length > 2) Some(args(2)) else None
    val writerVersion = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark" else
          System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)

    val turns = TranscriptGen.turns(spark, n, seed = 42L, partitions = 32).toDF
    // raw log line: "yyyy-MM-dd HH:mm:ss.SSS <role> <text>\n"
    val rawBytes = turns.select(
      (octet_length(col("text")) + octet_length(col("role")) + lit(23 + 2 + 1))
        .cast("long").as("b"))
      .agg(sum(col("b"))).head.getLong(0)

    val out = Files.createTempDirectory("graft-compress").toString
    val pqOpts = Map("compression" -> codec) ++
      zstdLevel.map("parquet.compression.codec.zstd.level" -> _) ++
      writerVersion.map("parquet.writer.version" -> _)
    ClpPipeline.run(spark, turns,
      ClpPipeline.Config(out, maxSinks = 64, saltParts = 64,
        parquetOptions = pqOpts))
    def dirBytes(f: java.io.File): Long =
      org.apache.commons.io.FileUtils.sizeOf(f)
    val archBytes = dirBytes(new java.io.File(out))
    // general-purpose-compressor baseline (what the reference benchmarks
    // against): the same rendered lines, gzipped
    val gzDir = Files.createTempDirectory("graft-compress-gz").toString + "/t"
    turns.select(concat(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"), lit(" "),
        col("role"), lit(" "), col("text")).as("value"))
      .write.option("compression", "gzip").mode("overwrite").text(gzDir)
    val gzBytes = dirBytes(new java.io.File(gzDir))
    val profile = codec + zstdLevel.map("-l" + _).getOrElse("") +
      writerVersion.map("-" + _).getOrElse("")
    println(f"turns=$n raw=${rawBytes / 1e6}%.1f MB archive($profile)=${archBytes / 1e6}%.1f MB " +
      f"ratio=${rawBytes.toDouble / archBytes}%.2fx " +
      f"gzip-baseline=${gzBytes / 1e6}%.1f MB (${rawBytes.toDouble / gzBytes}%.2fx)")
    // per-component breakdown (where the archive bytes live)
    Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
      .sortBy(-dirBytes(_)).foreach(f =>
        println(f"  ${f.getName}%-18s ${dirBytes(f) / 1e6}%8.1f MB"))
    if (sys.env.contains("GRAFT_PROBE_KEEP")) println(s"kept archive at $out")
    else org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(gzDir).getParentFile)
    spark.stop()
  }
}

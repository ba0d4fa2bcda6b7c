package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{ClpPipeline, TranscriptGen}

/** Dev-only: bisect the route stage cost. */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)
    val work = Files.createTempDirectory("probe").toString
    TranscriptGen.turns(spark, n, partitions = cores * 2)
      .write.mode("overwrite").parquet(s"$work/turns")
    val turns = spark.read.parquet(s"$work/turns")
    val cfg = ClpPipeline.Config(s"$work/out", maxSinks = 64, saltParts = 64, filesPerSink = 8)
    ClpPipeline.parse(turns).write.mode("overwrite").parquet(s"${cfg.outDir}/parsed")
    val parsed = spark.read.parquet(s"${cfg.outDir}/parsed")
    val lt = ClpPipeline.buildLogtypeDict(parsed, cfg)
    lt.write.mode("overwrite").parquet(s"${cfg.outDir}/logtype_dict")
    val vd = ClpPipeline.buildVarDict(parsed, cfg)
    vd.write.mode("overwrite").parquet(s"${cfg.outDir}/var_dict")
    val ltd = spark.read.parquet(s"${cfg.outDir}/logtype_dict")
    val vdd = spark.read.parquet(s"${cfg.outDir}/var_dict")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("collect varDict map") {
      val m = vdd.select("value", "var_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[probe]   map size ${m.size}")
    }
    val enc = ClpPipeline.encodeAndEnrich(parsed, ltd, vdd, TranscriptGen.roleToolLookup(spark))
    timed("encoded -> noop")(enc.write.format("noop").mode("overwrite").save())
    timed("encoded -> repartition -> noop")(
      enc.repartition(cores * 2, col("sink_id"), pmod(xxhash64(col("conv_id")), lit(8)))
        .write.format("noop").mode("overwrite").save())
    timed("encoded -> flat parquet")(enc.write.mode("overwrite").parquet(s"$work/flat"))
    timed("full route")(ClpPipeline.route(enc, cfg))
    spark.stop()
  }
}

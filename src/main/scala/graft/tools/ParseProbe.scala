package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{ClpPipeline, TranscriptGen}
/** Dev-only: bisect the parse stage scaling. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val turnsPath = "/dev/shm/parseprobe-turns"
    if (!new java.io.File(turnsPath + "/_SUCCESS").exists) {
      val s0 = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s0.sparkContext.setLogLevel("WARN")
      TranscriptGen.turns(s0, 8000000L, partitions = 64)
        .write.mode("overwrite").parquet(turnsPath)
      s0.stop()
    }
    for (cores <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", (cores * 2).toString)
        .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      graft.functions.ClpFunctions.register(spark)
      def timed(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[pp $cores] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val turns = spark.read.parquet(turnsPath)
      timed("read-only")(turns.select(sum(octet_length(col("text")) % 1000)).collect())
      timed("read+encode->noop")(ClpPipeline.parse(turns).write.format("noop").mode("overwrite").save())
      for (i <- 1 to 4) timed(s"read+encode->noop rep$i")(ClpPipeline.parse(turns).write.format("noop").mode("overwrite").save())
      timed("read+encode->parquet")(ClpPipeline.parse(turns)
        .write.mode("overwrite").parquet(s"/dev/shm/pp-out-$cores"))
      spark.stop()
    }
  }
}

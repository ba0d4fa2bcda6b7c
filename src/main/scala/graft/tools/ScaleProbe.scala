package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only: raw Spark CPU scaling probe. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // pure codegen CPU
      var t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, cores * 2)
        .select(sum(xxhash64(col("id"), col("id")) % 1000)).collect()
      println(f"[scale $cores] codegen-cpu: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // string-allocating map (like our encode path)
      import spark.implicits._
      t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, cores * 2).as[Long]
        .map(i => graft.pipeline.TranscriptGen.renderText((i % 50).toInt, i))
        .map(s => graft.core.ClpEncoding.encode(s).logtype.length.toLong)
        .reduce(_ + _)
      println(f"[scale $cores] string-encode: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
    }
  }
}

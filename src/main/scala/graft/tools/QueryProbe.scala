package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: time a named gate query (args: name [sfDir] [reps]) — the
  * iteration loop behind per-query tuning decisions recorded in
  * BENCH/BASELINE.md. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)
    for (i <- 0 until reps) {
      val t0 = System.nanoTime()
      graft.GraftQueries.queries(name)(spark, sf)
        .write.mode("overwrite").format("noop").save()
      println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

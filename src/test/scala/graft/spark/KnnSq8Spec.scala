package graft.spark

import graft.GraftQueries
import graft.functions.ClpFunctions.vec_sq8
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantized ANN (`knn_sq8`): the int8 code stays within half a
  * quantization step of the input, the quantized column is 1/4 the float32
  * width (the 100 TB memory lever), and the coarse integer-dot ranking plus
  * exact re-rank recovers the brute-force top-k on the test corpus. */
class KnnSq8Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("quantization error is ≤ half a step per element, and codes fit int8") {
    val err = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("q8", vec_sq8(col("embedding"), lit(127.0)))
      .select(array_max(zip_with(col("q8"), col("embedding"),
        (q, x) => abs(q.cast("double") / 127.0 - x.cast("double")))).as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    // |q/127 - x| ≤ 0.5/127 whenever |x| ≤ 1 (no clamping on this corpus)
    assert(err <= 0.5 / 127.0 + 1e-12, s"max reconstruction error $err")
  }

  test("coarse int8 top-15 + exact re-rank equals brute-force top-5") {
    val sq8 = GraftQueries.queries("knn_sq8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = GraftQueries.queries("knn_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sq8 == exact, s"sq8=$sq8 exact=$exact")
  }

  test("the coarse scorer is an Expression, not a UDF") {
    val df = GraftQueries.queries("knn_sq8")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("), "knn_sq8 plan must be UDF-free")
  }
}

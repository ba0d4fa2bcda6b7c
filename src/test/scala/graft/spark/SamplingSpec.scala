package graft.spark

import graft.GraftQueries
import org.apache.spark.sql.functions.col

/** Deterministic split/sampling assignments: the hash-bucket split must hit
  * its target fractions (within hash noise), be disjoint+exhaustive, and be
  * identical across runs and partitionings (no RNG state — the property that
  * makes the split reproducible on any cluster size). */
class SamplingSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("split_train_val is exhaustive, disjoint, near 80/10/10, and stable") {
    val rows = GraftQueries.queries("split_train_val")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val n = rows.length.toDouble
    assert(n == 500)
    assert(rows.map(_._1).distinct.length == 500) // one assignment per doc
    val frac = rows.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.05, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.05, s"test ${frac("test")}")
    // rerun == identical assignment (pure function of doc_id)
    val again = GraftQueries.queries("split_train_val")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rows.toSeq == again.toSeq)
  }

  test("sample_stratified thins each language at its configured rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = GraftQueries.queries("sample_stratified")(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-downsampled strata are kept whole
    Seq("es", "zh", "de").foreach(l => assert(kept(l) == total(l), l))
    // downsampled strata land near their rate (hash noise at n~100-200)
    val enRate = kept("en").toDouble / total("en")
    val frRate = kept("fr").toDouble / total("fr")
    assert(math.abs(enRate - 0.5) < 0.15, s"en rate $enRate")
    assert(math.abs(frRate - 0.8) < 0.15, s"fr rate $frRate")
    // the kept set is a subset of the corpus keyed by the same ids
    val keptIds = GraftQueries.queries("sample_stratified")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val allIds = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(allIds))
  }
}

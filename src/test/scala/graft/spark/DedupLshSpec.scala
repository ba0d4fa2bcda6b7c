package graft.spark

import graft.GraftQueries

/** Bucketed (LSH) embedding dedup vs the exact all-pairs kernel: the same
  * exact cosine kernel runs per bucket, so every emitted pair must be in the
  * exact result (zero false positives); recall is the LSH trade-off and must
  * stay usable at the demo plane count. */
class DedupLshSpec extends SparkSpecBase {

  private def pairs(name: String, sf: String): Set[(Long, Long)] =
    GraftQueries.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_embedding_lsh emits a subset of the exact pairs, with recall") {
    val sf = "/root/testdata/sf0.001"
    val exact = pairs("dedup_embedding", sf)
    val lsh = pairs("dedup_embedding_lsh", sf)
    assert(exact.nonEmpty)
    assert(lsh.nonEmpty, "LSH bucketing produced no co-bucketed near-dup pairs")
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.1, f"recall $recall%.2f below floor at 4 planes")
  }

  test("knn_lsh returns brute-force-scored rows from the probed bucket") {
    val sf = "/root/testdata/sf0.001"
    val brute = GraftQueries.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every LSH hit must carry the same exact cosine score the brute-force
    // kernel computes for that id — wait-free check on the top probe results
    val lsh = GraftQueries.queries("knn_lsh")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(lsh.nonEmpty)
    lsh.foreach { case (id, score) =>
      brute.get(id).foreach(exp => assert(math.abs(exp - score) < 1e-9))
    }
  }

  test("multi-probe widens the candidate set toward brute force") {
    val sf = "/root/testdata/sf0.001"
    def scored(name: String): Map[Long, Double] =
      GraftQueries.queries(name)(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val single = scored("knn_lsh")
    val multi = scored("knn_lsh_multiprobe")
    val brute = scored("knn_bruteforce")
    // multi-probe's top-k scores dominate single-probe's (superset of
    // candidates, same exact scoring) and move toward the brute-force top-k
    assert(multi.values.min >= single.values.min - 1e-9)
    val bruteTop = brute.values.max
    assert(multi.values.max >= single.values.max - 1e-9)
    assert(multi.values.max <= bruteTop + 1e-9)
  }
}

package graft.spark

import graft.GraftQueries
import org.apache.spark.sql.functions.col

/** Connected components over the near-dup pair graph ([[graft.Dedup
  * .connectedComponents]]): min-label propagation must settle chains (multi-
  * round convergence), keep separate components apart, and — on the gate
  * query — place both endpoints of every verified near-dup pair in the same
  * cluster keyed by the component's minimum doc_id. */
class DedupClusterSpec extends SparkSpecBase {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph converges to one component labeled by its minimum") {
    // 9-vertex chain: diameter 8, so propagation needs multiple rounds
    val chain = (1L to 8L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.keySet == (1L to 9L).toSet)
    assert(labels.values.toSet == Set(1L))
  }

  test("disjoint components keep distinct min labels") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(labels(10L) == 10L && labels(11L) == 10L && labels(12L) == 10L)
    assert(labels(20L) == 20L && labels(21L) == 20L)
    assert(labels(30L) == 30L && labels(31L) == 30L)
  }

  test("dedup_clusters agrees with the verified pair graph") {
    val sf = "/root/testdata/sf0.001"
    val pairs = GraftQueries.queries("dedup_ngram_jaccard")(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val labels = GraftQueries.queries("dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly the vertices of the pair graph are clustered
    assert(labels.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every edge share a cluster
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
    // each cluster is labeled by its own minimum member
    labels.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl not labeled by its min")
    }
  }

  test("dedup_keep_canonical keeps exactly one doc per cluster plus singletons") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val labels = GraftQueries.queries("dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = GraftQueries.queries("dedup_keep_canonical")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = all -- labels.collect { case (id, lbl) if id != lbl => id }
    assert(kept == expected)
    // every cluster contributes exactly its canonical member
    labels.values.toSet.foreach { lbl: Long => assert(kept.contains(lbl)) }
  }
}

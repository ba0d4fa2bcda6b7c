package graft.spark

import org.apache.spark.sql.functions._

import graft.{Dedup, GraftQueries}

/** SemDeDup ([[Dedup.semanticKeep]]): k-means cells restrict the candidate
  * pair join, the exact cosine kernel verifies, one canonical member
  * survives per duplicate component. Cells can only LOSE cross-cell pairs —
  * so the clustered variant keeps a superset of the exact kernel's kept
  * set, and its drop-recall is the knob. */
class SemanticDedupSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private def kept(name: String): Set[Long] =
    GraftQueries.queries(name)(spark, sf).collect().map(_.getLong(0)).toSet

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("nlist=1 equals an exact recomputation of keep-canonical over cosine pairs") {
    val total = emb.count()
    val exact = kept("dedup_semantic_all")
    assert(exact.nonEmpty && exact.size < total,
      s"degenerate corpus: kept ${exact.size} of $total")
    // recompute from the oracle-checked exact pair kernel + components
    val pairsDf = GraftQueries.queries("dedup_embedding")(spark, sf)
    val drop = Dedup.connectedComponents(pairsDf, "a_id", "b_id")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact == (all -- drop))
  }

  test("clustered SemDeDup keeps a superset of exact, with drop-recall") {
    val exact = kept("dedup_semantic_all")
    val clustered = kept("dedup_semantic")
    assert(exact.subsetOf(clustered),
      s"clustered dropped non-duplicates: ${exact -- clustered}")
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val (dropExact, dropClustered) = (all -- exact, all -- clustered)
    assert(dropExact.nonEmpty)
    // this corpus's near-dups sit at cos≈0.4 (nothing above 0.6 exists), far
    // below SemDeDup's ≥0.9 operating point where duplicates co-locate in a
    // cell almost surely — the floor reflects that demo-width geometry, same
    // as DedupLshSpec's 0.1 floor at 4 planes
    val recall = dropClustered.size.toDouble / dropExact.size
    assert(recall >= 0.3, f"drop-recall $recall%.2f below floor at 4 cells")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query bodies live in [[GraftQueries]] (operator coverage per SURVEY §2). */
object SparkEntry {

  /** Flagship on sf0.001: the CLP round-trip gate over the documents table —
    * rows > 0 iff decode(encode(text)) == text holds for whole groups. */
  def entry(spark: SparkSession): DataFrame =
    GraftQueries.queries("clp_roundtrip")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = GraftQueries.queries

  /** DuckDB-runnable oracle per query. The LSH/banding queries recompute
    * their deterministic plane/signature sets inside the SQL (inlined
    * DOUBLE[] literals / per-band equality joins), so the only rows-only
    * queries left are the two whose non-SQL step is k-means: knn_ivf at
    * nProbe=2 and dedup_semantic at nlist=4. Their exact twins
    * (knn_ivf_all, dedup_semantic_all) ARE oracle-checked, and
    * KnnIvfSpec / SemanticDedupSpec assert recall. */
  def oracleSql: Map[String, String] = GraftQueries.oracleSql
}

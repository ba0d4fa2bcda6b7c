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

  /** DuckDB-runnable oracle per query (omitted ⇒ rows-only check:
    * dedup_minhash_pairs [LSH banding], knn_lsh [ANN bucket probe],
    * knn_lsh_multiprobe [Hamming-1 probe], knn_ivf [k-means cells],
    * dedup_embedding_lsh [LSH-bucketed cosine] — their exact kernels ARE
    * oracle-checked via dedup_ngram_jaccard / knn_bruteforce /
    * dedup_embedding, and the sbt suite asserts recall / probe-all
    * equivalence vs those baselines). */
  def oracleSql: Map[String, String] = GraftQueries.oracleSql
}

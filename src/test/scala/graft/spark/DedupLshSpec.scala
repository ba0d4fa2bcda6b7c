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

  test("production widths: banded MinHash (128 fns, r=2) recall >= 0.9, rises with width") {
    val sf = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // ground truth: the oracle-checked exact all-pairs kernel (j >= 0.2)
    val exact = pairs("dedup_ngram_jaccard", sf)
    assert(exact.nonEmpty)
    def lshPairs(nFns: Int, r: Int): Set[(Long, Long)] =
      graft.Dedup.minhashLshPairs(docs, "doc_id", "text", nFns, r, jMin = 0.2)
        .select(col("a_id"), col("b_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val demo = lshPairs(4, 1)   // the demo-width S-curve: 1-(1-j)^4
    val prod = lshPairs(128, 2) // production: 1-(1-j^2)^64 ≈ 0.93 at j=0.2
    assert(demo.subsetOf(exact), s"false positives: ${(demo -- exact).take(3)}")
    assert(prod.subsetOf(exact), s"false positives: ${(prod -- exact).take(3)}")
    val recallProd = prod.size.toDouble / exact.size
    val recallDemo = demo.size.toDouble / exact.size
    assert(recallProd >= 0.9, f"production recall $recallProd%.3f below 0.9")
    assert(recallProd >= recallDemo - 1e-9,
      f"recall did not rise with width: demo $recallDemo%.3f prod $recallProd%.3f")
  }

  test("hot-bucket star cap: linear candidates, components preserved") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import spark.implicits._
    // a boilerplate cohort: 30 identical docs (every band is one hot
    // bucket) plus distinct background docs
    val cohort = (0L until 30L).map(i => (i, "the same boilerplate line repeated verbatim"))
    val noise = (100L until 120L).map(i =>
      (i, s"distinct background document number $i with its own words ${i * 7} ${i * 13}"))
    val docs = (cohort ++ noise).toDF("doc_id", "text")
    def run(cap: Int) =
      graft.Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2, jMin = 0.5, hotBucketCap = cap)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = run(Int.MaxValue)
    val starred = run(5)
    // all-pairs: C(30,2) = 435 cohort pairs; star: 29 (min-doc spokes)
    assert(allPairs.count(p => p._1 < 30 && p._2 < 30) == 435)
    assert(starred.count(p => p._1 < 30 && p._2 < 30) == 29)
    assert(starred.subsetOf(allPairs))
    // the dedup decision is unchanged: connected components over the
    // verified pairs merge the whole cohort either way
    def components(pairs: Set[(Long, Long)]) = {
      val df = pairs.toSeq.toDF("a_id", "b_id")
      graft.Dedup.connectedComponents(df, "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cAll = components(allPairs)
    val cStar = components(starred)
    // every cohort doc is labeled, and with ONE component, under both modes
    assert((0L until 30L).forall(cStar.contains), "cap dropped cohort members")
    assert(cStar.filter(_._1 < 30).values.toSet.size == 1,
      s"cohort split under the cap: ${cStar.filter(_._1 < 30)}")
    assert(cAll.filter(_._1 < 30).values.toSet.size == 1)
  }

  test("production widths: OR-amplified embedding LSH (16 tables x 4 planes) recall >= 0.9") {
    val sf = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = GraftQueries.queries("dedup_embedding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    def lshPairs(tables: Int): Set[(Long, Long)] =
      graft.Dedup.embeddingLshPairs(emb, tables, planesPerTable = 4,
          seed = 42L, cosMin = 0.4)
        .select(col("a_id"), col("b_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val one = lshPairs(1)
    val prod = lshPairs(16)
    assert(prod.subsetOf(exact), s"false positives: ${(prod -- exact).take(3)}")
    val recallProd = prod.size.toDouble / exact.size
    val recallOne = one.size.toDouble / exact.size
    assert(recallProd >= 0.9, f"production recall $recallProd%.3f below 0.9")
    assert(recallProd >= recallOne - 1e-9, "recall did not rise with table count")
  }

  test("a zero embedding scores cos 0 instead of poisoning pairs with NaN") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val v = Array.fill(8)(0.5f)
    val emb = Seq(
      (0L, v.toSeq), (1L, v.toSeq),                 // exact duplicates
      (2L, Array.fill(8)(0.0f).toSeq)               // zero vector present
    ).toDF("vec_id", "embedding")
    val got = graft.Dedup.embeddingLshPairs(emb, tables = 16, planesPerTable = 2,
        seed = 1L, cosMin = 0.9)
      .select(col("a_id"), col("b_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the duplicate pair survives with a finite score; the zero vector
    // neither appears (cos 0 < 0.9) nor turns anything into NaN
    assert(got == Set((0L, 1L, 1.0)), s"got $got")
  }

  test("two MinHash families differing only in mod stay independently bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq("a b c", "b c d", "c d e"))).toDF("id", "sh")
    val a = Array(3L, 5L); val b = Array(7L, 11L)
    // same (a, b) — a registry keyed on the family hash would rebind the
    // first Column to the second family's mod before analysis
    val c1 = graft.functions.ClpFunctions.minhash_sigs(col("sh"), a, b, 1000033L)
    val c2 = graft.functions.ClpFunctions.minhash_sigs(col("sh"), a, b, 13L)
    val r = df.select(c1.as("s1"), c2.as("s2")).head
    val s1 = r.getSeq[Long](0); val s2 = r.getSeq[Long](1)
    assert(s2.forall(_ < 13L), s"mod-13 family leaked large values: $s2")
    assert(s1.exists(_ >= 13L), s"mod-1000033 family was rebound to mod 13: $s1")
  }

  test("wide SimHash: 64-bit signatures separate better than 8-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 0
      (2L, "completely different content about spark shuffles and parquet files")
    ).toDF("doc_id", "text").withColumn("w", split(col("text"), " "))
    def dist(bits: Int): Map[(Long, Long), Int] = {
      val sigs = docs.select(col("doc_id"), graft.Dedup.simhash(col("w"), bits).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (for (a <- sigs.keys; b <- sigs.keys if a < b)
        yield (a, b) -> java.lang.Long.bitCount(sigs(a) ^ sigs(b))).toMap
    }
    val d64 = dist(64)
    // near-dups are closer than unrelated docs at production width
    assert(d64((0L, 1L)) < d64((0L, 2L)))
    assert(d64((0L, 1L)) < d64((1L, 2L)))
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

package graft.spark

import graft.{GraftQueries, KnnIvf}
import org.apache.spark.sql.functions._

/** IVF ANN ([[graft.KnnIvf]]): the codegen'd assignment must agree with the
  * local mirror, probing ALL cells must reproduce brute force exactly (same
  * scoring kernel, only the pruning differs), recall must rise with nProbe,
  * and a persisted `partitionBy("cell")` index must turn the probe into a
  * partition-pruned scan — the property that makes IVF the 100 TB path. */
class KnnIvfSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val centroids =
    KnnIvf.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 3)

  private def topK(nProbe: Int, k: Int): Seq[(Long, Double)] = {
    val qVec = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble).toArray
    val cells = KnnIvf.probeCells(qVec, centroids, nProbe)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    KnnIvf.index(emb.filter(col("vec_id") =!= 0), "embedding", centroids)
      .filter(col("cell").isin(cells.map(Int.box).toIndexedSeq: _*))
      .crossJoin(broadcast(q))
      .withColumn("score", round(
        graft.functions.ClpFunctions.vec_dot(col("embedding"), col("q_emb")) /
          (sqrt(graft.functions.ClpFunctions.vec_dot(col("embedding"), col("embedding"))) *
           sqrt(graft.functions.ClpFunctions.vec_dot(col("q_emb"), col("q_emb")))), 4))
      .select("vec_id", "score")
      .orderBy(desc("score"), asc("vec_id")).limit(k)
      .collect().toSeq.map(r => r.getLong(0) -> r.getDouble(1))
  }

  test("distributed cell assignment agrees with the local mirror") {
    val rows = KnnIvf.index(emb, "embedding", centroids)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val expected = KnnIvf.nearestCentroid(
        v.map(_ / math.max(math.sqrt(v.map(x => x * x).sum), 1e-300)), centroids)
      assert(r.getInt(2) == expected, s"vec ${r.getLong(0)}")
    }
    // k-means actually separates the corpus: more than one populated cell
    assert(rows.map(_.getInt(2)).distinct.length > 1)
  }

  test("probing all cells reproduces brute force exactly") {
    val brute = GraftQueries.queries("knn_bruteforce")(spark, sf).collect()
      .toSeq.map(r => r.getLong(0) -> r.getDouble(1))
    assert(topK(nProbe = 8, k = 5) == brute)
  }

  test("recall rises with nProbe; gate query scores are brute-force-exact") {
    val brute = GraftQueries.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r1 = topK(nProbe = 1, k = 5).map(_._1).toSet
    val r2 = topK(nProbe = 2, k = 5).map(_._1).toSet
    val recall1 = (r1 & brute.keySet).size.toDouble / brute.size
    val recall2 = (r2 & brute.keySet).size.toDouble / brute.size
    assert(recall2 >= recall1 - 1e-9, s"recall fell with nProbe: $recall1 -> $recall2")
    assert(recall2 > 0, "nProbe=2 found none of the true top-k")
    // the gate query (nProbe=2) carries exact brute-force scores per id
    GraftQueries.queries("knn_ivf")(spark, sf).collect().foreach { r =>
      brute.get(r.getLong(0)).foreach(exp =>
        assert(math.abs(exp - r.getDouble(1)) < 1e-9))
    }
  }

  test("IVF x SQ8: probe-all equals the flat SQ8 scan; fewer probes stay exact-scored") {
    val qVec = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble).toArray
    val indexed = KnnIvf.index(emb.filter(col("vec_id") =!= 0), "embedding", centroids)
    // probe-all: the cell filter is a no-op, so IVF x SQ8 must equal the
    // oracle-checked flat SQ8 scan (same coarseK/k, same kernels)
    val flat = GraftQueries.queries("knn_sq8")(spark, sf).collect()
      .toSeq.map(r => r.getLong(0) -> r.getDouble(1))
    val all = KnnIvf.searchQuantized(indexed, centroids, qVec,
      nProbe = 8, coarseK = 15, k = 5).collect()
      .toSeq.map(r => r.getLong(0) -> r.getDouble(1))
    assert(all == flat, s"probe-all IVF x SQ8 diverged from the flat scan")
    // narrow probe: every returned score is still the exact float-kernel
    // cosine for that id (quantization only selects candidates, never
    // scores), and the result is non-empty
    val bruteAll = topK(nProbe = 8, k = 200).toMap
    val narrow = KnnIvf.searchQuantized(indexed, centroids, qVec,
      nProbe = 1, coarseK = 15, k = 5).collect()
      .toSeq.map(r => r.getLong(0) -> r.getDouble(1))
    assert(narrow.nonEmpty)
    narrow.foreach { case (id, score) =>
      assert(math.abs(bruteAll(id) - score) < 1e-9, s"score drift for $id")
    }
  }

  test("production shape: nlist=256 assigns via one argmax_dot, no greatest chain") {
    // 256 cells over the sf corpus: the assignment plan must stay O(1) —
    // one broadcast-matrix argmax_dot, not a 256-way greatest of literals
    val cs256 = KnnIvf.trainCentroids(emb, "vec_id", "embedding", nlist = 256, iters = 1)
    val indexed = KnnIvf.index(emb, "embedding", cs256)
    val p = indexed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("argmax_dot"), "expected the broadcast-matrix assignment")
    assert(!p.contains("greatest("), "per-centroid literal chain crept back")
    assert(indexed.select("cell").distinct().count() > 1)
    // the assignment still agrees with the local mirror at this width
    indexed.select(col("vec_id"), col("embedding"), col("cell")).limit(50)
      .collect().foreach { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-300)
        assert(r.getInt(2) == KnnIvf.nearestCentroid(v.map(_ / n), cs256))
      }
  }

  test("coarse scan of a persisted index reads codes, never the embedding column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-codes").toString
    KnnIvf.index(emb.filter(col("vec_id") =!= 0), "embedding", centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
    val qVec = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble).toArray
    val coarse = KnnIvf.coarseCandidates(stored, centroids, qVec,
      nProbe = 2, coarseK = 15)
    val p = coarse.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema:")).mkString("\n")
    assert(readSchemas.contains("codes"), readSchemas)
    assert(!readSchemas.contains("embedding"),
      s"coarse scan still reads the float column:\n$readSchemas")
    // and the quantized end-to-end search on the stored index matches the
    // in-memory one (codes column vs on-the-fly fallback)
    val a = KnnIvf.searchQuantized(stored, centroids, qVec,
      nProbe = 8, coarseK = 15, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = KnnIvf.searchQuantized(
      KnnIvf.index(emb.filter(col("vec_id") =!= 0), "embedding", centroids).drop("codes"),
      centroids, qVec, nProbe = 8, coarseK = 15, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "stored-codes path diverged from the on-the-fly fallback")
  }

  test("a partitionBy(cell) index makes the probe a partition-pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    KnnIvf.index(emb, "embedding", centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val probe = spark.read.parquet(dir).filter(col("cell").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"),
      s"cell probe did not prune partitions:\n$plan")
  }
}

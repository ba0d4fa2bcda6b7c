package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ClpFunctions.vec_dot

/** IVF (inverted-file) ANN index for cosine similarity: spherical k-means
  * partitions the corpus into `nlist` cells; a query probes only the
  * `nProbe` cells whose centroids are nearest, scanning `~nProbe/nlist` of
  * the data instead of all of it. This is the classic scale path next to
  * the hyperplane-LSH one in [[KnnLsh]]: LSH needs no training but its
  * recall is fixed by the plane set, while IVF trades a small training pass
  * for a tunable recall/scan-fraction knob.
  *
  * Scale notes (the 100 TB shape):
  *  - The centroid table is small BY CONSTRUCTION (≤ ~64k cells even for
  *    very large corpora), so collecting it once per Lloyd round and
  *    re-broadcasting it is driver-safe — the per-row assignment is one
  *    codegen'd `argmax_dot` against the broadcast matrix (O(1) plan size
  *    at any nlist) and the per-dimension means stay fully distributed.
  *  - Train on a deterministic sample (pass the sample as `df`); assign the
  *    full corpus once and persist `partitionBy("cell")` so probes become
  *    partition-pruned scans (asserted in KnnIvfSpec).
  *  - Everything per-row is codegen'd `vec_dot` — no Scala UDF in the
  *    assignment or scoring path.
  */
object KnnIvf {

  /** L2-normalize an `array<float|double>` column to `array<double>` (zero
    * vectors stay zero, so the dot of anything with them is 0, not NaN).
    * One codegen'd pass — a HOF normalize would re-evaluate the norm
    * subtree per element (interpreted ArrayTransform has no CSE): O(dim^2). */
  def normalized(emb: Column): Column =
    graft.functions.ClpFunctions.vec_normalize(emb)

  /** Nearest-centroid id by dot product (≡ cosine on normalized input) as a
    * single codegen'd `argmax_dot` over a BROADCAST centroid matrix. The
    * previous shape — one `vec_dot(emb, typedLit(c))` per centroid folded
    * with `greatest` — was correct at gate nlist but exploded the expression
    * tree and the generated code at production nlist (256–65k cells × 768
    * dims); the matrix now rides the plan as one reference object, and ties
    * still break to the smallest cell id. */
  def nearestCentroidCol(emb: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    graft.functions.ClpFunctions.argmax_dot(emb, bc)

  /** Broadcast the centroid matrix once for a train/index pass. */
  def broadcastCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]])
      : org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] = {
    require(centroids.nonEmpty, "need at least one centroid")
    spark.sparkContext.broadcast(centroids)
  }

  /** Local mirror of [[nearestCentroidCol]] for driver-side vectors. */
  def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var dot = 0.0
      var k = 0
      val n = math.min(v.length, c.length)
      while (k < n) { dot += v(k) * c(k); k += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
  }

  private def l2norm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else v
  }

  /** Spherical k-means (Lloyd's) with deterministic seeding: the initial
    * centroids are the normalized embeddings of the `nlist` lowest ids, and
    * each round reassigns (distributed, codegen'd) then recomputes
    * per-dimension means (one posexplode + groupBy) and re-normalizes.
    * Cells that go empty keep their previous centroid. Fixed `iters`, no
    * RNG — the whole index is reproducible from the input. */
  def trainCentroids(df: DataFrame, idCol: String, embCol: String,
                     nlist: Int, iters: Int): Array[Array[Double]] = {
    val base = df.select(col(idCol).as("id"), normalized(col(embCol)).as("e"))
    var centroids: Array[Array[Double]] = base.orderBy("id").limit(nlist)
      .select(col("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val bc = broadcastCentroids(df.sparkSession, centroids)
      val means = base
        .select(nearestCentroidCol(col("e"), bc).as("cid"),
          posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(avg("v").as("m"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), col("pm.m").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        val m = l2norm(r.getSeq[Double](1).toArray)
        if (m.exists(_ != 0.0)) next(r.getInt(0)) = m
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Assign every vector to its cell AND quantize it once: (idCol, embCol
    * untouched, cell, codes). The caller persists this `partitionBy("cell")`
    * so probes prune at the file level, and [[searchQuantized]]'s coarse
    * scan reads ONLY (id, cell, codes) — the int8 codes column is 4× smaller
    * than the float32 embeddings, which is where SQ8's scan-residency win
    * actually lands (quantizing per query would re-read the floats and
    * forfeit it). */
  def index(df: DataFrame, embCol: String,
            centroids: Array[Array[Double]]): DataFrame = {
    val bc = broadcastCentroids(df.sparkSession, centroids)
    df.withColumn("cell", nearestCentroidCol(normalized(col(embCol)), bc))
      .withColumn("codes",
        graft.functions.ClpFunctions.vec_sq8(col(embCol), lit(127.0)))
  }

  /** IVF × SQ8 — the two index families composed the way a production
    * vector store runs them (the FAISS `IVF…,SQ8` default at scale): probe
    * the `nProbe` nearest cells, coarse-rank ONLY the probed slice by the
    * integer dot over int8 codes (4× smaller residency than float32, and
    * bit-stable candidate selection — small-integer math has no FP
    * rounding), then exact-cosine re-rank just the top `coarseK`
    * survivors. With `nProbe = nlist` the cell filter is a no-op and the
    * result equals the flat SQ8 scan (asserted in KnnIvfSpec), so recall
    * loss comes only from the probe knob, never the quantization plumbing.
    * `indexed` is [[index]]'s output (persist it `partitionBy("cell")` so
    * the probe filter prunes at the file level). */
  def searchQuantized(indexed: DataFrame, centroids: Array[Array[Double]],
                      q: Array[Double], nProbe: Int, coarseK: Int, k: Int,
                      idCol: String = "vec_id",
                      embCol: String = "embedding"): DataFrame = {
    val cells = probeCells(q, centroids, nProbe)
    // float literal: the corpus embeddings are array<float>, and the exact
    // re-rank must reproduce the flat scan's float-kernel scores bit-for-bit
    val qLit = typedLit(q.map(_.toFloat).toSeq)
    // coarse stage: (id, codes) only over the probed cells — never the
    // float column; then the driver collects the coarseK ids (a per-query,
    // coarseK-sized action, same cost class as probeCells) so the re-rank
    // scan gets an id IN-list that parquet can push down — the two-phase
    // read a production vector store runs, not a second full-cell pass
    val ids = coarseCandidates(indexed, centroids, q, nProbe, coarseK, idCol, embCol)
      .select(col(idCol)).collect().map(_.get(0))
    indexed.filter(col("cell").isin(cells.toSeq: _*))
      .filter(col(idCol).isin(ids.toSeq: _*))
      .withColumn("score", round(
        vec_dot(col(embCol), qLit) /
          (sqrt(vec_dot(col(embCol), col(embCol))) *
           sqrt(vec_dot(qLit, qLit))), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), asc(idCol)).limit(k)
  }

  /** The coarse stage of [[searchQuantized]], exposed so its plan is
    * testable: integer `vec_qdot` over the STORED int8 codes of the probed
    * cells → top `coarseK` candidate ids. Reads only (id, cell, codes); the
    * on-the-fly `vec_sq8(embCol)` fallback exists solely for inputs indexed
    * before codes were persisted. */
  def coarseCandidates(indexed: DataFrame, centroids: Array[Array[Double]],
                       q: Array[Double], nProbe: Int, coarseK: Int,
                       idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame = {
    import graft.functions.ClpFunctions.{vec_qdot, vec_sq8}
    val cells = probeCells(q, centroids, nProbe)
    // quantize the query ONCE on the driver — a vec_sq8(qLit) row
    // expression is not foldable, so the coarse scan would re-quantize the
    // query per scanned row. Mirrors the kernel exactly (floor(x·127+0.5)
    // clamped, from the float value) so the codes are identical.
    val qCodes = q.map { v =>
      math.max(-127.0,
        math.min(127.0, math.floor(v.toFloat.toDouble * 127.0 + 0.5))).toByte
    }
    val codesCol =
      if (indexed.columns.contains("codes")) col("codes")
      else vec_sq8(col(embCol), lit(127.0))
    indexed.filter(col("cell").isin(cells.toSeq: _*))
      .select(col(idCol), codesCol.as("c8"))
      .withColumn("qdot", vec_qdot(col("c8"), typedLit(qCodes.toSeq)))
      .orderBy(desc("qdot"), asc(idCol)).limit(coarseK)
      .select(col(idCol), col("qdot"))
  }

  /** The `nProbe` cells nearest to a query vector (driver-side: the probe
    * list is per-query and centroid-sized). Ties break to the smaller id. */
  def probeCells(q: Array[Double], centroids: Array[Array[Double]],
                 nProbe: Int): Array[Int] = {
    val qn = l2norm(q)
    centroids.zipWithIndex
      .map { case (c, i) =>
        val n = math.min(c.length, qn.length)
        var dot = 0.0
        var k = 0
        while (k < n) { dot += c(k) * qn(k); k += 1 }
        (dot, i)
      }
      .sortBy { case (d, i) => (-d, i) }
      .take(nProbe).map(_._2)
  }
}

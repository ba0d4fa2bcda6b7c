package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ClpFunctions.{minhash_sigs, simhash64, vec_dot}

/**
 * Production-width near-duplicate detection — the parameterized twins of the
 * demo-width oracle-gate entries in [[GraftQueries]] (which stay at 4
 * MinHash fns / 8-bit SimHash / 4 LSH planes because their DuckDB oracles
 * mirror every hash constant). These APIs carry the widths a real 100 TB
 * dedup run uses:
 *
 *   - banded MinHash (n fns, bands of r rows): candidate probability
 *     follows the 1-(1-j^r)^(n/r) S-curve, so recall at a target Jaccard is
 *     a KNOB, not an accident; all n signatures compute in ONE codegen'd
 *     pass ([[graft.functions.MinhashSigsExpr]])
 *   - 64-bit SimHash ([[graft.functions.Simhash64Expr]])
 *   - OR-amplified hyperplane LSH for embeddings (L tables × k planes):
 *     recall 1-(1-p^k)^L rises with L at fixed precision-per-table
 *
 * All stages follow the scale shape the round-2 verdict blessed: banded
 * bucket join on NARROW keys, pair-dedup before the payload re-join, the
 * exact kernel (Jaccard / cosine) only per candidate pair.
 */
object Dedup {

  /**
   * Connected components over a near-dup pair graph — the clustering step a
   * real dedup pipeline runs after pair generation (each component keeps one
   * canonical document; the rest are dropped). Returns one row per vertex
   * that appears in any edge: (doc_id, cluster_id) with cluster_id = the
   * component's minimum vertex id, so the canonical representative is
   * deterministic.
   *
   * Algorithm: min-label propagation ("hash-to-min") — every round each
   * vertex takes the minimum label among itself and its neighbors, a
   * narrow join + partial-aggregated groupBy per round, converging in
   * O(component diameter) rounds. Near-dup components are near-cliques
   * (diameter 2-3), so 3-4 rounds settle real workloads; `localCheckpoint`
   * truncates the growing lineage each round so round N's plan does not
   * re-derive rounds 1..N-1. For adversarial long-chain graphs the
   * alternating small-star/large-star variant (O(log n) rounds) is the
   * published upgrade path; the join shape below is identical.
   */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    val sym = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = sym.join(labels.withColumnRenamed("id", "s"), Seq("s"))
        .select(col("d").as("id"), col("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      // labels only ever decrease, so one anti-ish comparison detects the
      // fixpoint; count() is the round's single action
      done = next.alias("n").join(labels.alias("o"), "id")
        .filter(col("n.lbl") < col("o.lbl")).isEmpty
      labels = next
      iter += 1
    }
    // label propagation needs O(component diameter) rounds; past the cap the
    // labels are NOT component minima and canonical-keep dedup downstream
    // would keep/drop the wrong documents — fail loud, never return them
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter); raise maxIter")
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Deterministic MinHash family (splitmix-derived, odd multipliers);
    * shares [[KnnLsh.mix]] so the two LSH families stay on one splitmix. */
  def minhashFamily(n: Int, mod: Long = 1000033L): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(n)(i => ((KnnLsh.mix(2L * i + 1).abs % (mod - 2)) | 1L))
    val b = Array.tabulate(n)(i => KnnLsh.mix(2L * i + 2).abs % mod)
    (a, b)
  }

  /**
   * Banded MinHash + LSH near-dup pairs over a (id, text) table:
   * shingle → n signatures (one pass) → band keys (xxhash of r-slices) →
   * bucket join on narrow keys → exact-Jaccard verify per candidate.
   *
   * @param nFns     family size (production: 128)
   * @param bandRows rows per band `r` (bands b = nFns / r); tune the
   *                 1-(1-j^r)^b S-curve to the target similarity
   * @param jMin     exact-Jaccard verify threshold
   * @param hotBucketCap buckets larger than this emit STAR candidates
   *                 (bucket-min ↔ each member) instead of all pairs. A
   *                 boilerplate-heavy corpus puts a hot shingle's whole
   *                 cohort into one (band, key) bucket — all-pairs there is
   *                 O(c²) in the cohort (a 2556-doc bucket is 3.3M
   *                 candidates), which no verify kernel outruns at 100 TB.
   *                 The star keeps every member connected to the bucket in
   *                 the candidate graph, so the downstream
   *                 [[connectedComponents]] dedup still merges the cohort
   *                 (members whose star edge fails the Jaccard verify can
   *                 still connect through their OTHER bands); the verified
   *                 pair LIST is no longer exhaustive inside hot buckets —
   *                 callers that need every pair keep the default no-cap.
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      nFns: Int, bandRows: Int, jMin: Double,
                      hotBucketCap: Int = Int.MaxValue): DataFrame = {
    require(nFns % bandRows == 0, "nFns must be a multiple of bandRows")
    val nBands = nFns / bandRows
    val (fa, fb) = minhashFamily(nFns)
    val base = docs.select(
      col(idCol).as("doc_id"),
      array_distinct(GraftQueries.shingles(split(col(textCol), " "))).as("sh"))
      // sub-3-token docs have NO shingles: their signatures would all be the
      // identical all-MaxValue vector, co-bucketing every such doc in every
      // band (O(m^2) candidates) only for the 0/0 Jaccard verify to null
      // them all out. MinHash is undefined on an empty set — such docs
      // belong to the exact-dedup path (dedup_exact / dedup_normalized)
      .filter(size(col("sh")) > 0)
      .withColumn("sigs", minhash_sigs(col("sh"), fa, fb, 1000033L))
    // band keys: xxhash64 over each band's signature slice — one narrow
    // (band, key, id) stream into the bucket join, shingles stay behind
    val banded = base.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), bnd =>
        xxhash64(bnd, slice(col("sigs"), bnd * bandRows + 1, lit(bandRows)))))
        .as(Seq("band", "key")))
    val pairs = (if (hotBucketCap == Int.MaxValue) {
      banded.select(col("band"), col("key"), col("doc_id").as("a_id"))
        .join(banded.select(col("band"), col("key"), col("doc_id").as("b_id")),
          Seq("band", "key"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
    } else {
      // per-bucket size + min in ONE narrow partial-aggregating pass; the
      // all-pairs self-join runs only under the cap, hot buckets emit the
      // linear star (rep = bucket min, so rep < member always holds)
      val stats = banded.groupBy("band", "key")
        .agg(count(lit(1)).as("sz"), min(col("doc_id")).as("rep"))
      val tagged = banded.join(stats, Seq("band", "key"))
      val small = tagged.filter(col("sz") <= hotBucketCap)
        .select(col("band"), col("key"), col("doc_id"))
      val smallPairs = small.select(col("band"), col("key"), col("doc_id").as("a_id"))
        .join(small.select(col("band"), col("key"), col("doc_id").as("b_id")),
          Seq("band", "key"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
      val hotPairs = tagged.filter(col("sz") > hotBucketCap)
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
      smallPairs.unionByName(hotPairs)
    }).distinct()
    val shTbl = base.select(col("doc_id"), col("sh"))
    pairs
      .join(shTbl.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(shTbl.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("j", round(
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double"), 4))
      .filter(col("j") >= jMin)
      .select("a_id", "b_id", "j")
  }

  /** 64-bit (or narrower) SimHash column over a token array. */
  def simhash(words: Column, bits: Int = 64): Column = {
    require(bits >= 1 && bits <= 64)
    simhash64(words, lit(bits))
  }

  /**
   * OR-amplified hyperplane LSH near-dup pairs over a (vec_id, embedding)
   * table: L independent tables of k planes each; a pair is a candidate if
   * co-bucketed in ANY table; the exact cosine kernel verifies candidates.
   * Recall ≈ 1-(1-p^k)^L where p = 1 - θ/π.
   */
  /**
   * Semantic dedup (SemDeDup, arXiv:2303.09540 — the k-means-then-prune
   * curation step LLM pipelines run over embedding spaces): cluster the
   * normalized embeddings with spherical k-means ([[KnnIvf.trainCentroids]]),
   * generate candidate pairs ONLY within a cell (the 100 TB shape — the
   * pair join is keyed on `cell`, never all-pairs), verify each candidate
   * with the exact codegen'd-cosine kernel, and keep one canonical member
   * (component minimum) per duplicate component. Returns the kept ids.
   *
   * `nlist = 1` degenerates to exact semantic dedup (every pair compared) —
   * the oracle-checked kernel; larger `nlist` trades recall on cross-cell
   * pairs for per-cell work, the same subset-of-exact contract as the LSH
   * family (asserted in `SemanticDedupSpec`).
   */
  def semanticKeep(emb: DataFrame, idCol: String, embCol: String,
                   nlist: Int, iters: Int, cosMin: Double): DataFrame = {
    require(cosMin > 0, s"cosMin must be positive, got $cosMin")
    // nlist = 1 is the exact path: one cell means every row lands in cell 0
    // whatever the centroid is, so k-means training (a collect + Lloyd
    // rounds over the corpus) would be two full passes computing an unused
    // value — skip straight to the single-cell assignment
    val indexed =
      if (nlist == 1) emb.withColumn("cell", lit(0))
      else KnnIvf.index(emb, embCol,
        KnnIvf.trainCentroids(emb, idCol, embCol, nlist, iters))
    val cells = indexed
      .select(col(idCol).as("id"), KnnIvf.normalized(col(embCol)).as("e"), col("cell"))
      // zero embeddings have no direction: cosMin > 0 can never drop them,
      // so skip the pair join entirely (same guard as embeddingLshPairs)
      .filter(vec_dot(col("e"), col("e")) > 0)
    val a = cells.select(col("cell"), col("id").as("a_id"), col("e").as("a_e"))
    val b = cells.select(col("cell"), col("id").as("b_id"), col("e").as("b_e"))
    val pairs = a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
      .filter(round(vec_dot(col("a_e"), col("b_e")), 4) >= cosMin)
      .select("a_id", "b_id")
    val drop = connectedComponents(pairs, "a_id", "b_id")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("id"))
    emb.select(col(idCol).as("id")).join(drop, Seq("id"), "left_anti")
  }

  def embeddingLshPairs(emb: DataFrame, tables: Int, planesPerTable: Int,
                        seed: Long, cosMin: Double): DataFrame = {
    // cosMin > 0 lets zero vectors (undefined cosine, normalized to zero) be
    // dropped BEFORE bucketing — left in, they all co-bucket at the
    // all-ones bucket of every table (vec_dot(0, plane) >= 0), an O(m^2)
    // candidate blowup whose pairs the cosMin filter then discards anyway
    require(cosMin > 0, s"cosMin must be positive, got $cosMin")
    // plane dimensionality comes from the data (one row head) — hardcoding
    // it would silently bucket on a PREFIX of wider embeddings (vec_dot
    // stops at min length) and violate the advertised recall with no error
    val dimRow = emb.select(size(col("embedding"))).take(1)
    if (dimRow.isEmpty)
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("a_id"), lit(0L).as("b_id"), lit(0.0).as("cos"))
    val dim = dimRow(0).getInt(0)
    // guarded one-pass normalization: a zero embedding stays zero (never
    // NaN-poisons a pair), then drops out of bucketing entirely
    val e = emb
      .select(col("vec_id"), graft.KnnIvf.normalized(col("embedding")).as("emb"))
      .filter(vec_dot(col("emb"), col("emb")) > 0)
    val tableCols: Seq[Column] = (0 until tables).map { t =>
      val planes = KnnLsh.hyperplanes(planesPerTable, dim, seed = seed + 1000L * t)
      struct(lit(t).as("tbl"), KnnLsh.bucketCol(col("emb"), planes).as("bucket"))
    }
    val bucketed = e
      .select(col("vec_id"), explode(array(tableCols: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val pairs = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("a_id"))
      .join(bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("b_id")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    pairs
      .join(e.select(col("vec_id").as("a_id"), col("emb").as("a_emb")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("emb").as("b_emb")), Seq("b_id"))
      .withColumn("cos", round(vec_dot(col("a_emb"), col("b_emb")), 4))
      .filter(col("cos") >= cosMin)
      .select("a_id", "b_id", "cos")
  }
}

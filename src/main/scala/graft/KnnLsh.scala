package graft

/** Random-hyperplane LSH for cosine ANN: a deterministic (seeded) plane set;
  * the signature buckets vectors so the scale path probes one bucket instead
  * of scanning all vectors (brute force stays the exact baseline). */
object KnnLsh {

  /** splitmix64 finalizer — the one deterministic mixer behind both LSH
    * families ([[hyperplanes]] and [[Dedup.minhashFamily]]). */
  @inline private[graft] def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic hyperplanes, Gaussian-ish per coordinate via an
    * Irwin-Hall sum of 4 uniforms — plane DIRECTIONS must be (approximately)
    * spherically symmetric or the advertised collision model
    * p = 1 - θ/π becomes orientation-dependent; a single cube-uniform draw
    * biases axis-aligned data. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { i =>
        var s = 0.0
        var k = 0
        while (k < 4) {
          val h = mix(seed ^ (p.toLong << 40) ^ (i.toLong << 8) ^ k.toLong)
          s += h.toDouble / Long.MaxValue.toDouble // uniform in [-1, 1]
          k += 1
        }
        s // Irwin-Hall: ~N(0, 4/3), symmetric — sign-LSH only needs direction
      }
    }

  /** Sign-bit signature as a codegen'd Column: one `vec_dot` against each
    * plane literal, sign bits packed — stays inside whole-stage codegen
    * instead of a per-row Scala UDF (the plan a 100 TB bucketing pass
    * needs). Bit semantics identical to [[signature]]. */
  def bucketCol(emb: org.apache.spark.sql.Column,
                planes: Array[Array[Double]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import graft.functions.ClpFunctions.vec_dot
    planes.zipWithIndex.map { case (p, i) =>
      when(vec_dot(emb, typedLit(p.toSeq)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Sign-bit signature of a vector against the planes. */
  def signature(emb: Array[Float], planes: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val n = math.min(emb.length, plane.length)
      while (i < n) { dot += emb(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }
}

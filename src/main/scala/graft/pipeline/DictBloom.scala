package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Per-archive dictionary-token Bloom summary for fleet-level search
  * pruning.
  *
  * The reference answers "can this archive match?" per archive by opening
  * its variable dictionary and probing the query's exact tokens
  * (`clp/Grep.cpp` exact dict lookup → `QueryToken` WontMatch; the metadata
  * DB prunes only by timestamp range). At fleet scale (10^4-10^5 archives)
  * a token-ed query should not open 10^5 dictionary files to discover that
  * one archive contains "job_8843" — the membership summary belongs IN the
  * catalog, next to the ts bounds. This is the standard datalake trick
  * (parquet/ORC bloom indexes, Iceberg puffin files) applied at the
  * archive granularity.
  *
  * Layout: m = 8192 bits (128 longs ≈ 1 KB per archive — 10^5 archives
  * keep the whole fleet index under 100 MB, driver/metadata-sized), k = 3
  * hash probes. Positions are computed with Spark's own `xxhash64(seed,
  * value)` on the BUILD side (codegen'd, distributed — the dictionary never
  * collects) and with the same catalyst `XXH64` static kernel on the PROBE
  * side (driver, per query) — `DictBloomSpec` pins the two to bit-equality.
  *
  * Soundness: a Bloom "absent" is definitive (prune is safe); a Bloom
  * "present" may be a false positive (the archive is opened and its real
  * dictionary probe decides, exactly as without the summary). With m/n ≈ 16
  * bits/entry at the 500-token gate dictionaries the FP rate is < 1%; a
  * dictionary far past the design capacity saturates the filter toward
  * all-ones, which degrades to "prunes nothing" — never to a false
  * negative, so no insertion cap is needed for correctness (size m up for
  * fleets whose per-archive dictionaries run large).
  */
object DictBloom {

  /** Bits in the filter (power of two), longs in the packed bitset. */
  val M: Int = 8192
  val Longs: Int = M / 64
  private val Seeds: Seq[Long] = Seq(1L, 2L, 3L)

  /** xxhash64(lit(seed), value) % M, as computed by Spark SQL. */
  private def positionCols(value: Column): Seq[Column] =
    Seeds.map(s => pmod(xxhash64(lit(s), value), lit(M.toLong)).cast("int"))

  /** Build the packed bitset from a dictionary's value column: the k·n bit
    * positions aggregate distributed (explode → distinct), and only the
    * ≤ M distinct positions collect — O(bloom), never O(dictionary). */
  def build(dict: DataFrame, valueCol: String): Array[Long] = {
    val positions = dict
      .select(explode(array(positionCols(col(valueCol)): _*)).as("p"))
      .distinct().collect().map(_.getInt(0))
    val bits = new Array[Long](Longs)
    positions.foreach(p => bits(p >> 6) |= (1L << (p & 63)))
    bits
  }

  /** Driver-side probe, bit-identical to the build side's xxhash64:
    * fold seed 42 → hashLong(seed) → hashUTF8String(token). */
  private def positions(token: String): Seq[Int] = {
    val u = UTF8String.fromString(token)
    Seeds.map { s =>
      val h = XXH64.hashUTF8String(u, XXH64.hashLong(s, 42L))
      java.lang.Math.floorMod(h, M.toLong).toInt
    }
  }

  def mightContain(bits: Array[Long], token: String): Boolean =
    positions(token).forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0L)

  /** Fleet-prune decision for one archive: compile the query against a
    * Bloom-backed dictionary view and prune iff the compiler itself proves
    * WontMatch. Reusing [[graft.search.WildcardQueryCompiler.compile]] keeps
    * this decision EXACTLY as conservative as the real dictionary probe:
    *   - exact tokens that encode as int/float vars never consult the
    *     dictionary (compile checks encodability first) — not pruned here;
    *   - case-insensitive lookups and wildcard scans cannot be answered by
    *     a Bloom — the scan callback reports a pretend hit, so those paths
    *     never prune (sound, merely unhelpful);
    *   - only a definitive Bloom miss on a case-sensitive exact dictionary
    *     token yields WontMatch — the same token would miss the archive's
    *     real dictionary (no false negatives by Bloom construction).
    */
  def admits(bits: Array[Long], query: String, caseSensitive: Boolean): Boolean =
    graft.search.WildcardQueryCompiler.compile(
      query,
      tok => if (mightContain(bits, tok)) Some(0L) else None,
      _ => Seq(0L),
      caseSensitive) != graft.search.WildcardQueryCompiler.WontMatch
}

package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One conversation turn — the input row shape of the engine
  * (conv_id, turn_idx, role, text, tool, ts). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/**
 * Deterministic synthetic transcript corpus (seeded, generated distributed —
 * never collected to the driver, never read from outside). Templates are
 * Zipf-distributed so hot log-types exercise the skew paths on purpose, and
 * variable slots cover every encoding class: plain ints, zero-padded non-ints,
 * trailing-zero floats, hex ids, `key=value` tokens, paths, placeholder bytes
 * needing escape, and unicode.
 */
object TranscriptGen {

  val Roles: Array[String] = Array("user", "assistant", "system", "tool")
  val Tools: Array[String] = Array(
    "bash", "search", "browser", "editor", "compiler", "planner",
    "sql", "python", "retrieval", "calculator", "mailer", "scheduler")

  /** ~50 templates; %d int, %f float, %s string-ish var, %x hex, %p path. */
  val Templates: Array[String] = Array(
    "task %d completed in %f seconds with status=%s",
    " INFO Task task_%b assigned to container: [NodeAddress:10.0.%b.%b:%d]",
    "connection error %d from 10.0.%b.%b retry=%d",
    "uploaded %d bytes to %p in %f s",
    "checksum %x verified for file%b",
    "user asked about topic %d with confidence %f",
    "tool call %s returned rc=%d after %f ms",
    "compile module_%b: %d warnings, %d errors",
    "GET %p HTTP/1.1 rc=%d bytes=%d",
    "cache hit ratio %f over %d lookups",
    "spawned worker %x on core %d nice=%d",
    "temperature setting %f applied to session %x",
    "scheduling job %d at offset %d priority=%s",
    "payment of %f credited to account %x",
    "observed latency p50=%f p99=%f over %d samples",
    "agent step %d: invoking %s with timeout %d s",
    "fetched %d rows from shard %d in %f ms",
    "escaped chars ok in literal %d \\raw\\%b",
    "version 00%b is pinned (build %x)",
    "merged %d of %d chunks into %p",
    "rate limit %d/%d reached for key %x",
    "summarize doc %d: %d tokens in, %d tokens out",
    "embedding norm %f for vec %d",
    "héllo wörld turn %d with ünicode %f",
    "retrying rpc %s attempt=%d backoff=%f",
    "wrote checkpoint %p snapshot=%x rows=%d",
    "gc pause %f ms heap=%d MB",
    "model scored %f on batch %d",
    "conversation context trimmed to %d tokens",
    "lookup key=%s miss count=%d",
    "tls handshake with peer 10.%b.%b.%b took %f ms",
    "queue depth %d exceeds threshold %d",
    "assistant replied with %d sentences and %d citations",
    "parse warning at line %d col %d: token %s",
    "disk %p usage %f%% inodes=%d",
    "watchdog timer %d armed for pid %d",
    "loaded plugin %s v%b.%b.%b",
    "billing cycle %d closed with balance %f",
    "reduced shuffle from %d to %d partitions",
    "sensor %x reading %f at offset %d",
    "translated %d chars from lang_%b to lang_%b",
    "stacktrace frame %d: %p+0x%x",
    "session %x renewed ttl=%d s",
    "vector search top-%d over %d docs in %f ms",
    "dropped %d malformed events (reason=%s)",
    "autoscaler set replicas %d -> %d",
    "proxy %s forwarded %d reqs err=%d",
    "decoder emitted %d frames at %f fps",
    "final answer confidence %f after %d tool calls",
    "archive segment %d sealed bytes=%d dict=%d")

  private val StringVals: Array[String] = Array(
    "ok", "failed", "partial", "timeout", "cancelled", "high", "low",
    "retry", "fatal", "deferred")
  private val Paths: Array[String] = Array(
    "/var/log/app.log", "/tmp/stage_7/out.bin", "/data/part-00001.parquet",
    "/usr/local/bin/tool", "/home/user/notes.txt", "/srv/cache/blob")

  /** splitmix64 — deterministic per-index PRNG stream. */
  @inline private def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Zipf(s≈1.07) CDF over template ids — hot head, long tail. */
  private lazy val zipfCdf: Array[Double] = {
    val n = Templates.length
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1, 1.07))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  private def pickTemplate(u: Double): Int = {
    val cdf = zipfCdf
    var lo = 0
    var hi = cdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cdf(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Renders one template instance from a deterministic PRNG stream. */
  def renderText(templateId: Int, seed: Long): String = {
    val t = Templates(templateId)
    val out = new java.lang.StringBuilder(t.length + 32)
    var s = seed
    def next(): Long = { s = mix(s); s }
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '%' && i + 1 < t.length) {
        t.charAt(i + 1) match {
          case 'd' => out.append(java.lang.Long.toString(math.abs(next()) % 100000)); i += 2
          case 'b' => out.append(java.lang.Long.toString(math.abs(next()) % 500)); i += 2
          case 'f' =>
            val scale = (math.abs(next()) % 4 + 1).toInt
            val mant = math.abs(next()) % 1000000
            // keep trailing zeros sometimes: render fixed-scale decimals
            out.append(java.lang.Long.toString(mant / 1000)).append('.')
            val frac = java.lang.Long.toString(mant % 1000 + 1000).substring(1)
            out.append(frac.substring(0, math.min(scale, 3))); i += 2
          case 's' => out.append(StringVals((math.abs(next()) % StringVals.length).toInt)); i += 2
          // bounded hex-id space: dictionary variables REPEAT in real logs —
          // that's CLP's core premise; an unbounded random id space would make
          // the dictionary linear in the corpus and defeat the design
          case 'x' => out.append(java.lang.Long.toHexString(0x10000L + math.abs(next()) % 0xffffL)); i += 2
          case 'p' => out.append(Paths((math.abs(next()) % Paths.length).toInt)); i += 2
          case '%' => out.append('%'); i += 2
          case other => out.append(c).append(other); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  val BaseEpochMs: Long = 1704067200000L // 2024-01-01T00:00:00Z

  /** Builds one deterministic turn from (conversation, turn) coordinates. */
  def turnAt(conv: Long, turnIx: Int, seed: Long): Turn = {
    val h = mix(conv * 1000003L + turnIx ^ mix(seed))
    val u = ((h >>> 11).toDouble) / (1L << 53).toDouble
    val tid = pickTemplate(u)
    val role = Roles((math.abs(mix(h + 1)) % Roles.length).toInt)
    val tool =
      if (role == "tool" || math.abs(mix(h + 2)) % 5 == 0)
        Tools((math.abs(mix(h + 3)) % Tools.length).toInt)
      else null
    val ts = new Timestamp(BaseEpochMs + conv * 60000L + turnIx * 1250L + (math.abs(h) % 997))
    Turn(f"conv-$conv%010d", turnIx, role, renderText(tid, h), tool, ts)
  }

  /**
   * A deterministic corpus of ~`approxTurns` turns generated in parallel:
   * `spark.range` over conversations, a per-conv deterministic length in
   * [1, turnsPerConvMax], `explode(sequence(...))` for the turn indices, then
   * a typed map renders each row. Constant driver memory at any scale;
   * (conv_id, turn_idx) is a unique stable key by construction.
   */
  def turns(spark: SparkSession, approxTurns: Long, seed: Long = 42L,
            turnsPerConvMax: Int = 8, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism * 2
    val avgLen = (turnsPerConvMax + 1) / 2.0
    val nConvs = math.max(1L, math.round(approxTurns / avgLen))
    spark.range(0, nConvs, 1, parts)
      .select(col("id").as("conv"))
      .withColumn("n", (pmod(xxhash64(col("conv"), lit(seed)), lit(turnsPerConvMax)) + 1).cast("int"))
      .select(col("conv"), explode(sequence(lit(0), col("n") - 1)).as("turn_idx"))
      .as[(Long, Int)]
      .map { case (conv, turnIx) => TranscriptGen.turnAt(conv, turnIx, seed) }
  }

  /** The broadcast-side enrichment lookup: (role, tool) → team, cost class. */
  def roleToolLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      role <- Roles.toSeq
      tool <- Tools.toSeq :+ null.asInstanceOf[String]
    } yield {
      val h = math.abs(mix(role.hashCode.toLong * 31 + (if (tool == null) 0 else tool.hashCode)))
      (role, tool, s"team-${h % 7}", if (h % 3 == 0) "premium" else "standard")
    }
    rows.toDF("role", "tool", "team", "cost_class")
  }
}

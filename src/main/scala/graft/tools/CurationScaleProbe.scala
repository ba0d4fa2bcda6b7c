package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measured 10× scale points for the curation/dedup/ANN family —
  * the gate corpora are small, so "would this plan survive 100×" claims need
  * measured slopes: wall seconds AND shuffle bytes at 1× vs M× the sf0.1
  * documents/embeddings tables (results recorded in BENCH/BASELINE.md).
  *
  * Corpus construction preserves the duplicate STRUCTURE of the original
  * while replicating it M×, so the slope measures scale, not a structural
  * change in pair counts:
  *   - text copy k > 0 prefixes EVERY WORD with a copy tag — a BIJECTION
  *     of the word (and so shingle / gram / chunk) space: within a copy
  *     every frequency distribution is exactly the original's, across
  *     copies no token is shared, so dup/near-dup clusters replicate M×
  *     instead of merging. (An earlier variant inserted a copy token at
  *     every word GAP; that manufactured super-common shingles like
  *     "k3x the k3x" — one hashes low and becomes the MinHash min for
  *     thousands of a copy's docs, a 2556-doc bucket / 14M candidate
  *     pairs at 10× that the real corpus does not have.)
  *   - embedding copy k rotates the vector by k dims — a within-copy
  *     isometry (all pairwise dot products preserved), while rotations of
  *     independent vectors decorrelate across copies.
  *
  * Usage: CurationScaleProbe [copies] [sfDir] [query,query,…]
  */
object CurationScaleProbe {

  private val DefaultQueries = Seq(
    "dedup_substring", "dedup_minhash_pairs", "corpus_filter_chain",
    "stream_dedup", "dedup_exact", "dedup_paragraph",
    "knn_lsh", "knn_ivf", "knn_sq8", "dedup_embedding_lsh")

  /** Per-query stage-metric totals via listener (reset between queries). */
  private final class Metrics extends SparkListener {
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        spill += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { shuffleRead = 0L; shuffleWrite = 0L; spill = 0L }
  }

  def main(args: Array[String]): Unit = {
    val copies = if (args.length > 0) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val queries = if (args.length > 2) args(2).split(",").toSeq else DefaultQueries

    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-curation-scale-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark-probe"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ClpFunctions.register(spark)

    val work =
      if (new java.io.File("/dev/shm").canWrite)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
          s"/dev/shm/graft-scale-${ProcessHandle.current().pid()}")).toString
      else java.nio.file.Files.createTempDirectory("graft-scale").toString

    // ---- build the M× corpus (excluded from timing) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nDocs = docs.count(); val nEmbs = embs.count()
    val copyIdx = explode(sequence(lit(0), lit(copies - 1))).as("copy")
    val scaledDocs = docs.select(col("*"), copyIdx)
      .withColumn("doc_id", col("doc_id") + col("copy") * lit(10000000L))
      .withColumn("text", when(col("copy") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(^| )"),
          concat(lit("$1k"), col("copy").cast("string"), lit("x")))))
      .drop("copy")
    val dim = embs.selectExpr("size(embedding) AS d").head().getInt(0)
    val scaledEmbs = embs.select(col("*"), copyIdx)
      .withColumn("vec_id", col("vec_id") + col("copy") * lit(10000000L))
      .withColumn("embedding", when(col("copy") === 0, col("embedding"))
        .otherwise(concat(
          slice(col("embedding"), col("copy") + 1, lit(dim) - col("copy")),
          slice(col("embedding"), lit(1), col("copy")))))
      .drop("copy")
    scaledDocs.repartition(16).write.mode("overwrite")
      .parquet(s"$work/documents.parquet")
    scaledEmbs.repartition(16).write.mode("overwrite")
      .parquet(s"$work/embeddings.parquet")
    println(s"""{"probe":"corpus","copies":$copies,"docs":${nDocs * copies},"embs":${nEmbs * copies}}""")

    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    queries.foreach { name =>
      // warm-up rep at 1× primes JIT + file listings out of the measurement
      try graft.GraftQueries.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"""{"query":"$name","err":"warmup: ${e.getClass.getSimpleName}"}""") }
      Seq("1x" -> sfDir, s"${copies}x" -> work).foreach { case (tag, dir) =>
        Thread.sleep(200) // drain async listener events from the previous run
        metrics.reset()
        val t0 = System.nanoTime()
        val outcome =
          try { graft.GraftQueries.queries(name)(spark, dir)
            .write.mode("overwrite").format("noop").save(); "ok" }
          catch { case e: Throwable => e.getClass.getSimpleName }
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"""{"query":"$name","scale":"$tag","sec":$sec%.2f,"shuffle_read_mb":${metrics.shuffleRead / 1e6}%.1f,"shuffle_write_mb":${metrics.shuffleWrite / 1e6}%.1f,"spill_mb":${metrics.spill / 1e6}%.1f,"status":"$outcome"}""")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}

package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** Online near-dup filtering: a doc stream filtered batch-by-batch against
  * the accumulated signature store must equal the one-shot batch pass over
  * the concatenated input, survive batch replay unchanged, and drop
  * later near-dups of docs that were themselves dropped (seen ≠ kept). */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic corpus: doc i = 30 tokens from a 50-word vocab seeded by
  // i; mutate(i, m) flips m tokens — shingle Jaccard ≈ (28-3m+…)/34 stays
  // above the 0.5 estimator threshold for m <= 2, distinct docs share ~none
  private def baseText(i: Long): String = {
    val rnd = new scala.util.Random(7919L * i + 13)
    Seq.fill(30)(s"w${rnd.nextInt(50)}").mkString(" ")
  }
  private def mutate(text: String, m: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    val toks = text.split(" ")
    (0 until m).foreach(_ => toks(rnd.nextInt(toks.length)) = s"x${rnd.nextInt(9)}")
    toks.mkString(" ")
  }

  private val batch0: Seq[(Long, String)] =
    (0L until 20L).map(i => i -> baseText(i)) :+ (20L -> mutate(baseText(5), 2, 1L))
  private val batch1: Seq[(Long, String)] =
    (100L until 110L).map(i => i -> baseText(i)) ++
      Seq(110L -> mutate(baseText(3), 2, 2L), 111L -> "two tokens")
  private val batch2: Seq[(Long, String)] =
    (200L until 205L).map(i => i -> baseText(i)) :+
      (205L -> mutate(mutate(baseText(3), 2, 2L), 1, 3L)) // near-dup of DROPPED 110

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def keptIds(e: StreamingDedup): Set[Long] =
    e.readKept().select("doc_id").as[Long].collect().toSet

  test("three micro-batches equal the one-shot batch pass; replay is a no-op") {
    val streamDir = Files.createTempDirectory("graft-sdedup-s").toString
    val eS = new StreamingDedup(spark, streamDir)
    eS.processBatch(df(batch0), 0L)
    eS.processBatch(df(batch1), 1L)
    eS.processBatch(df(batch2), 2L)
    val streamed = keptIds(eS)

    // one-shot: everything in a single batch (ids increase across batches,
    // so "earlier batch" and "smaller id" agree)
    val batchDir = Files.createTempDirectory("graft-sdedup-b").toString
    val eB = new StreamingDedup(spark, batchDir)
    eB.processBatch(df(batch0 ++ batch1 ++ batch2), 0L)
    assert(streamed == keptIds(eB), "stream result diverged from the batch pass")

    // the planted dups died, originals and the shingle-less doc survived
    assert(!streamed.contains(20L) && !streamed.contains(110L))
    assert(streamed.contains(5L) && streamed.contains(3L) && streamed.contains(111L))
    // 205 near-duplicates 110, which was itself dropped: seen ≠ kept —
    // a dropped doc still suppresses its own later near-dups
    assert(!streamed.contains(205L))

    // replaying a committed batch id changes nothing
    eS.processBatch(df(batch1), 1L)
    assert(keptIds(eS) == streamed)

    // metrics audit: one row per committed batch, kept+dropped = in,
    // and the totals reconcile with the kept output exactly
    val m = eS.readMetrics().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._1).toSet == Set(0L, 1L, 2L))
    m.foreach { case (_, in, kept, dropped) => assert(in == kept + dropped) }
    assert(m.map(_._2).sum == (batch0 ++ batch1 ++ batch2).size)
    assert(m.map(_._3).sum == streamed.size)
  }

  test("compactStore consolidates deltas; reads and later batches are unchanged") {
    val dir = Files.createTempDirectory("graft-sdedup-c").toString
    val e = new StreamingDedup(spark, dir)
    e.processBatch(df(batch0), 0L)
    e.processBatch(df(batch1), 1L)
    val before = keptIds(e)
    val mBefore = e.readMetrics().collect().map(_.toSeq).toSet
    assert(e.compactStore())
    assert(!e.compactStore()) // nothing new since the watermark
    assert(keptIds(e) == before)
    assert(e.readMetrics().collect().map(_.toSeq).toSet == mBefore)
    // a batch after compaction still dedups against the consolidated store
    e.processBatch(df(batch2), 2L)
    assert(!keptIds(e).contains(205L) && keptIds(e).contains(202L))
    assert(e.compactStore()) // supersedes the previous watermark
    val finalKept = keptIds(e)
    assert(!finalKept.contains(205L) && finalKept.contains(202L))
    // a call inside the grace window is a silent no-op — a concurrent
    // reader may still hold the superseded paths
    e.expireStore() // default grace: the fresh compaction marker is too young
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/kept/batch_0")),
      "expireStore deleted inside the grace window")
    // expire reclaims superseded deltas + old compactions; reads unchanged
    e.expireStore(graceMs = 0L)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/kept/batch_0")))
    assert(keptIds(e) == finalKept)
    assert(e.readMetrics().count() == 3)
    // replaying an expired (marker-reclaimed) batch id is a no-op
    e.processBatch(df(batch1), 1L)
    assert(keptIds(e) == finalKept)
  }

  test("empty and all-short-doc batches commit without bricking the store") {
    val dir = Files.createTempDirectory("graft-sdedup-e").toString
    val e = new StreamingDedup(spark, dir)
    // batch 0: nothing shingleable — its bands/sigs deltas are EMPTY
    // (only _SUCCESS on disk); later reads must skip them, not die on
    // schema inference
    e.processBatch(df(Seq(300L -> "just two", 301L -> "tokens here")), 0L)
    e.processBatch(df(Seq.empty), 1L)
    // batch 2 still dedups against itself across the empty store deltas
    e.processBatch(df(Seq(302L -> baseText(1), 303L -> mutate(baseText(1), 2, 4L))), 2L)
    val kept = keptIds(e)
    assert(kept == Set(300L, 301L, 302L))
    val m = e.readMetrics().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(m.toSet == Set((0L, 2L, 0L), (1L, 0L, 0L), (2L, 2L, 1L)))
  }

  test("fuzz: random batch splits all equal the one-shot pass (production widths)") {
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 20260818L)
    val rnd = new scala.util.Random(seed)
    // corpus with a planted near-dup population: 40 bases + 20 mutated
    // copies of random bases at higher ids, plus a couple of degenerates
    val docs: Seq[(Long, String)] =
      (0L until 40L).map(i => i -> baseText(i)) ++
        (0 until 20).map { j =>
          (1000L + j) -> mutate(baseText(rnd.nextInt(40)), rnd.nextInt(3), seed + j)
        } ++ Seq(2000L -> "tiny", 2001L -> "")
    val oneDir = Files.createTempDirectory("graft-sdedup-f1").toString
    val eOne = new StreamingDedup(spark, oneDir)
    eOne.processBatch(df(docs), 0L)
    val expected = keptIds(eOne)

    for (trial <- 0 until 3) {
      // random contiguous split into 2-5 batches (ids increase across
      // batches — the contract under which stream == batch)
      val sorted = docs.sortBy(_._1)
      val nCuts = 1 + rnd.nextInt(4)
      val cuts = Seq.fill(nCuts)(rnd.nextInt(sorted.size)).distinct.sorted
      val slices = (Seq(0) ++ cuts ++ Seq(sorted.size)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => sorted.slice(a, b) }
        .filter(_.nonEmpty).toSeq
      val dir = Files.createTempDirectory(s"graft-sdedup-f$trial").toString
      val e = new StreamingDedup(spark, dir)
      slices.zipWithIndex.foreach { case (sl, b) => e.processBatch(df(sl), b.toLong) }
      assert(keptIds(e) == expected,
        s"trial $trial (seed $seed, cuts $cuts) diverged from the one-shot pass")
    }
  }

  test("foreachBatch wiring filters a MemoryStream source end-to-end") {
    val dir = Files.createTempDirectory("graft-sdedup-m").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-ck").toString
    val e = new StreamingDedup(spark, dir)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    source.addData(batch0)
    e.start(source.toDF().toDF("doc_id", "text"), ckpt).processAllAvailable()
    source.addData(batch1)
    e.start(source.toDF().toDF("doc_id", "text"), ckpt).processAllAvailable()
    val kept = keptIds(e)
    assert(!kept.contains(20L) && !kept.contains(110L) && kept.contains(3L))
  }
}

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

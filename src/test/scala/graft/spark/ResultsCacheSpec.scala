package graft.spark

import org.apache.spark.sql.functions._

import graft.pipeline.ResultsCache

/** Results-cache persistence + retention ([[graft.pipeline.ResultsCache]]):
  * the reference's per-job results collections, metadata registry, and
  * search-result garbage collector re-expressed on the lake shim. */
class ResultsCacheSpec extends SparkSpecBase {

  private val base = 1704067200000L
  private def ts(day: Long) = new java.sql.Timestamp(base + day * 86400000L)
  private def rows(n: Int, tag: String) =
    spark.range(n).select(col("id"), concat(lit(tag), col("id")).as("msg"))

  test("put/get roundtrip, registry, and loud refusals") {
    val root = java.nio.file.Files.createTempDirectory("graft-rc").toString
    assert(ResultsCache.jobs(spark, root).isEmpty)
    ResultsCache.put(spark, root, "7", rows(10, "a"), ts(0))
    ResultsCache.put(spark, root, "8", rows(3, "b"), ts(1))
    assert(ResultsCache.jobs(spark, root).map(j => (j._1, j._3)) ==
      Seq(("7", 10L), ("8", 3L)))
    assert(ResultsCache.get(spark, root, "7").orderBy("id")
      .collect().map(_.getString(1)).take(2).toSeq == Seq("a0", "a1"))
    // duplicate job id, non-digit id, and unknown job all refuse loudly —
    // the reference's digit-collection rule and NoCachedResult answer
    intercept[IllegalArgumentException](
      ResultsCache.put(spark, root, "7", rows(1, "x"), ts(0)))
    intercept[IllegalArgumentException](
      ResultsCache.put(spark, root, "../escape", rows(1, "x"), ts(0)))
    intercept[IllegalArgumentException](ResultsCache.get(spark, root, "99"))
  }

  test("sweep drops only expired jobs and is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft-rc-sweep").toString
    ResultsCache.put(spark, root, "1", rows(5, "old"), ts(0))
    ResultsCache.put(spark, root, "2", rows(5, "mid"), ts(2))
    ResultsCache.put(spark, root, "3", rows(5, "new"), ts(4))
    // horizon at day 3: jobs 1 and 2 expire; job 3 survives untouched
    assert(ResultsCache.sweep(spark, root, ts(3)) == Seq("1", "2"))
    assert(ResultsCache.jobs(spark, root).map(_._1) == Seq("3"))
    intercept[IllegalArgumentException](ResultsCache.get(spark, root, "1"))
    assert(ResultsCache.get(spark, root, "3").count() == 5)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/jobs/1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/jobs/3")))
    // idempotent: nothing left past the horizon; empty root sweeps clean
    assert(ResultsCache.sweep(spark, root, ts(3)).isEmpty)
    val empty = java.nio.file.Files.createTempDirectory("graft-rc-none").toString
    assert(ResultsCache.sweep(spark, empty, ts(3)).isEmpty)
  }

  test("a crashed sweep resumes cleanly on either side of the commit") {
    val root = java.nio.file.Files.createTempDirectory("graft-rc-crash").toString
    ResultsCache.put(spark, root, "1", rows(4, "a"), ts(0))
    ResultsCache.put(spark, root, "2", rows(4, "b"), ts(0))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cand = new org.apache.hadoop.fs.Path(s"$root/_results_gc_candidates")

    // crash AFTER the metadata commit, before the delete: job 1 is out of
    // the registry but its dir remains — the next sweep's heal finishes
    val keep = graft.pipeline.LakeTable.read(spark, s"$root/_results_metadata")
      .filter(col("job_id") =!= "1")
    val os = fs.create(cand, true); os.write("1".getBytes("UTF-8")); os.close()
    graft.pipeline.LakeTable.overwrite(spark, s"$root/_results_metadata", keep)
    assert(ResultsCache.sweep(spark, root, ts(-1)).isEmpty) // heal-only
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/jobs/1")))
    assert(!fs.exists(cand))

    // crash BEFORE the commit: candidate still registered — data survives
    val os2 = fs.create(cand, true); os2.write("2".getBytes("UTF-8")); os2.close()
    assert(ResultsCache.sweep(spark, root, ts(-1)).isEmpty)
    assert(ResultsCache.get(spark, root, "2").count() == 4)
    assert(!fs.exists(cand))
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-results cache with retention — the reference's results-cache
  * MongoDB plus its garbage collector re-expressed on the lake shim. The
  * reference stores each search job's results in a collection named by the
  * numeric job id, tracks jobs in a results-metadata collection, and a
  * sweeper drops every collection whose newest document predates the
  * retention horizon, deleting the metadata row first and the collection
  * second (`job_orchestration/garbage_collector/
  * search_result_garbage_collector.py:43-69`; digit-name rule at `:54`).
  *
  * Here each job's result set is its own snapshot-versioned [[LakeTable]]
  * under `root/jobs/<job_id>` and `root/_results_metadata` is the metadata
  * collection (`job_id, finished_ts, n_rows`). [[sweep]] is the GC pass,
  * with the reference's expiry rule (newest write strictly before the
  * horizon) and the same crash-resumable candidate-buffer protocol
  * [[ClpCatalog.retire]] uses: heal leftovers, persist candidates, commit
  * the pruned metadata (the point of no return — from that instant [[get]]
  * refuses the job), delete the data, clear the buffer. A candidate is
  * deletable iff the committed metadata no longer references it, which
  * makes every crash interleaving safe.
  *
  * Scale shape: the metadata table is O(#jobs) rows of a few columns —
  * kilobytes at the reference's real job counts — and the sweep reads ONLY
  * metadata to decide; result data is touched once, to delete it.
  */
object ResultsCache {

  /** The reference's GC only considers digit-named collections
    * (`search_result_garbage_collector.py:54`) — same rule here, which also
    * keeps the id safe as a path segment. */
  private val JobIdRule = "^[0-9]{1,32}$".r

  private def metaDir(root: String) = s"$root/_results_metadata"
  private def jobDir(root: String, jobId: String) = s"$root/jobs/$jobId"

  /** Persist one finished search job's result set and register it. The data
    * commit lands BEFORE the metadata commit, so a crash between the two
    * leaves an unregistered result dir no reader ever sees (a rerun of the
    * same job id overwrites it in place) — never a registered job without
    * data. */
  def put(spark: SparkSession, root: String, jobId: String, results: DataFrame,
          finishedTs: java.sql.Timestamp): Unit = {
    require(JobIdRule.matches(jobId), s"invalid job id '$jobId' (digits only)")
    require(!jobs(spark, root).exists(_._1 == jobId),
      s"job $jobId already has cached results")
    LakeTable.overwrite(spark, jobDir(root, jobId), results)
    val rows = LakeTable.snapshot(spark, jobDir(root, jobId)).map(_.rows).getOrElse(0L)
    LakeTable.append(spark, metaDir(root),
      spark.range(1).select(
        lit(jobId).as("job_id"),
        lit(finishedTs).cast("timestamp").as("finished_ts"),
        lit(rows).as("n_rows")))
  }

  /** Registered jobs as (job_id, finished_ts, n_rows), job-id order. */
  def jobs(spark: SparkSession, root: String): Seq[(String, java.sql.Timestamp, Long)] =
    LakeTable.snapshot(spark, metaDir(root)) match {
      case None => Nil
      case Some(_) => LakeTable.read(spark, metaDir(root))
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    }

  /** Re-read a cached job's results. Refuses an unregistered (or swept) job
    * loudly — the reference's NoCachedResult answer, not an empty frame. */
  def get(spark: SparkSession, root: String, jobId: String): DataFrame = {
    require(jobs(spark, root).exists(_._1 == jobId),
      s"no cached results for job $jobId")
    LakeTable.read(spark, jobDir(root, jobId))
  }

  /** Retention sweep: drop every job whose `finished_ts` is strictly before
    * `horizon` (the caller computes it as now − retention_period, exactly
    * the reference's `get_expiry_epoch_secs`). Returns the job ids retired
    * by THIS sweep; leftovers healed from a crashed sweep were already
    * reported by the sweep that committed them. */
  def sweep(spark: SparkSession, root: String,
            horizon: java.sql.Timestamp): Seq[String] = {
    val candidatesPath = new org.apache.hadoop.fs.Path(s"$root/_results_gc_candidates")
    val fs = candidatesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def deleteJobs(ids: Seq[String]): Unit =
      ids.foreach(id =>
        fs.delete(new org.apache.hadoop.fs.Path(jobDir(root, id)), true))
    def readCandidates(): Seq[String] =
      if (!fs.exists(candidatesPath)) Nil
      else {
        val in = fs.open(candidatesPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      }
    def writeCandidates(ids: Seq[String]): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_results_gc_candidates.tmp")
      val out = fs.create(tmp, true)
      try out.write(ids.mkString("\n").getBytes("UTF-8")) finally out.close()
      fs.delete(candidatesPath, false)
      require(fs.rename(tmp, candidatesPath), s"rename failed for $candidatesPath")
    }

    val registered = jobs(spark, root).map(_._1).toSet

    // 1. heal a crashed previous sweep: a candidate no longer in the
    //    committed metadata was retired but not fully deleted — finish the
    //    delete; one still registered means the crash preceded the metadata
    //    commit — its data is live, drop the candidate
    val leftover = readCandidates()
    if (leftover.nonEmpty) {
      deleteJobs(leftover.filterNot(registered.contains))
      fs.delete(candidatesPath, false)
    }

    val expired = jobs(spark, root).collect {
      case (id, ts, _) if ts != null && ts.before(horizon) => id
    }
    if (expired.nonEmpty) {
      // 2. durable candidates; 3. atomic metadata commit; 4. delete; 5. clear
      writeCandidates(expired)
      val keep = LakeTable.read(spark, metaDir(root))
        .filter(!col("job_id").isInCollection(expired))
      LakeTable.overwrite(spark, metaDir(root), keep)
      deleteJobs(expired)
      fs.delete(candidatesPath, false)
    }
    expired
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-archive catalog — the reference's archive metadata database
  * (`components/clp-py-utils/clp_py_utils/clp_metadata_db_utils.py:34-52`:
  * `archives(begin_timestamp, end_timestamp, uncompressed_size, …)`, and the
  * compression scheduler that opens one archive per job) re-expressed as a
  * tiny snapshot-versioned [[LakeTable]] next to the archive directories it
  * indexes: each archive registers itself with an atomic [[appendEntry]]
  * commit, and searches can pin the fleet as-of a catalog snapshot.
  *
  * Ingest writes one CLP archive per slice value plus one catalog row with
  * that archive's timestamp bounds and message count (rolled up from its
  * `sink_stats`, the same index [[graft.search.ClpSearch]] consults
  * per-sink). Search reads the catalog FIRST — O(#archives) metadata, never
  * data — and compiles per-archive plans only for archives whose
  * [begin, end] intersects the query range, exactly the reference's
  * "evaluate the timestamp index before decompressing anything" rule
  * (`clp_s/search/EvaluateTimestampIndex.cpp`) lifted one level, from sinks
  * within an archive to archives within a fleet. At fleet scale (10^4-10^5
  * archives on object storage) a time-bounded query opens a handful of
  * archive directories; the catalog itself stays kilobytes.
  */
object ClpCatalog {

  /** Routes `turns` into one archive per distinct `sliceCol` value under
    * `outDir/archives/arch_<slice>`, then writes `outDir/catalog`.
    *
    * The per-slice loop is the TEST harness shape: the distinct slice list
    * is archive-count-sized (catalog-tiny, never row-sized). In production
    * each archive is written by its own ingest job as data arrives (the
    * reference's scheduler dispatches one compression job per archive) and
    * `appendEntry` registers it — there is no fleet-wide loop anywhere.
    */
  def ingest(spark: SparkSession, turns: DataFrame, sliceCol: Column,
             outDir: String, maxSinks: Int = 8, saltParts: Int = 8,
             tagsFor: String => Seq[String] = _ => Nil): Unit = {
    // a null slice value (e.g. a null ts through a date-truncation slice)
    // must not NPE the sort or silently match no rows in the === filter
    // below — it routes to its own named archive, losslessly
    val sliced = turns.withColumn("_slice",
      coalesce(sliceCol.cast("string"), lit("null")))
    val slices = sliced.select("_slice").distinct()
      .collect().map(_.getString(0)).sorted
    slices.foreach { sl =>
      ClpPipeline.run(spark, sliced.filter(col("_slice") === sl).drop("_slice"),
        ClpPipeline.Config(s"$outDir/archives/arch_$sl",
          maxSinks = maxSinks, saltParts = saltParts))
    }
    // snapshot 1 is the empty catalog (creates the table + schema); each
    // archive then registers itself through appendEntry — an empty corpus
    // still commits a valid catalog, matching the batch pipeline's
    // empty-input contract (search over it answers zero rows, not an error)
    LakeTable.overwrite(spark, s"$outDir/catalog", emptyCatalog(spark))
    slices.foreach(sl => appendEntry(spark, outDir, s"arch_$sl", tagsFor(sl)))
  }

  /** The zero-row catalog frame that seeds a new fleet (snapshot 1, defines
    * the table schema). ONE definition — `appendEntry`/`appendJsonEntry`
    * gate their optional columns on what the committed catalog carries, so
    * a literal drifting at one ingest site would silently create catalogs
    * locked out of the corresponding prune forever. */
  def emptyCatalog(spark: SparkSession): DataFrame = spark.range(0).select(
    lit("").as("archive_id"), lit(null).cast("timestamp").as("begin_ts"),
    lit(null).cast("timestamp").as("end_ts"), lit(0L).as("n_messages"),
    lit(null).cast("array<bigint>").as("dict_bloom"),
    lit(null).cast("array<string>").as("tags"),
    lit(null).cast("array<string>").as("columns"))

  /** Register one finished archive in the fleet catalog: roll its ts bounds
    * + message count up from its own `sink_stats` (metadata-only, no data
    * scan) and commit the row as a [[LakeTable]] append — the registration
    * is ATOMIC (a crashed registration is invisible, rerun-safe) and the
    * catalog is snapshot-versioned, so a fleet search can pin the set of
    * archives as-of a snapshot while ingest keeps registering new ones.
    * This is the production path (the reference's scheduler registers each
    * compression job's archive in the metadata DB as it completes);
    * [[ingest]]'s per-slice loop is the test-harness shape. */
  def appendEntry(spark: SparkSession, outDir: String, archiveId: String,
                  tags: Seq[String] = Nil): Long = {
    val base = spark.read.parquet(s"$outDir/archives/$archiveId/sink_stats")
      .agg(min(col("min_ts")).as("begin_ts"), max(col("max_ts")).as("end_ts"),
        sum(col("n_rows")).cast("long").as("n_messages"))
      .withColumn("archive_id", lit(archiveId))
      .select("archive_id", "begin_ts", "end_ts", "n_messages")
    // dictionary-token Bloom summary (see [[DictBloom]]) and user tags:
    // registered only when the committed catalog carries the column — a
    // catalog created before either existed keeps appending its own schema
    // (the lake shim refuses silent drift), it just never fleet-prunes by
    // token / is never tag-addressable
    val catCols = LakeTable.read(spark, s"$outDir/catalog").columns.toSet
    var entry = base
    if (catCols.contains("dict_bloom")) {
      val bloom =
        try Some(DictBloom.build(
          spark.read.parquet(s"$outDir/archives/$archiveId/var_dict"), "value"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      entry = entry.withColumn("dict_bloom",
        bloom.map(b => typedLit(b.toSeq)).getOrElse(lit(null))
          .cast("array<bigint>"))
    }
    if (catCols.contains("tags"))
      entry = entry.withColumn("tags",
        (if (tags.isEmpty) lit(null) else typedLit(tags)).cast("array<string>"))
    if (catCols.contains("columns"))
      // text archives carry no MPT; the column-set prune never applies
      entry = entry.withColumn("columns", lit(null).cast("array<string>"))
    LakeTable.append(spark, s"$outDir/catalog", entry)
  }

  /** Catalog rows as (archive_id, begin, end) — the fleet timestamp index,
    * read at the committed snapshot (or `asOf` an older one). */
  def entries(spark: SparkSession, outDir: String, asOf: Option[Long] = None)
      : Array[(String, java.sql.Timestamp, java.sql.Timestamp)] =
    LakeTable.read(spark, s"$outDir/catalog", asOf)
      .select("archive_id", "begin_ts", "end_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))

  /** Archive ids whose [begin, end] intersects [tsLo, tsHi] — decided from
    * the catalog alone, before any archive directory is opened. */
  def admissibleArchives(spark: SparkSession, outDir: String,
                         tsLo: Option[java.sql.Timestamp],
                         tsHi: Option[java.sql.Timestamp],
                         asOf: Option[Long] = None): Seq[String] =
    entries(spark, outDir, asOf).collect {
      // null bounds (an archive whose turns all lack timestamps) cannot be
      // pruned by time — such an archive is always admissible, same as the
      // sink-level rule in ClpSearch
      case (id, b, e)
          if b == null || e == null ||
            (tsLo.forall(lo => !e.before(lo)) && tsHi.forall(hi => !b.after(hi))) => id
    }.toSeq

  /** Catalog-level token + tag pruning on top of the ts prune: archives
    * whose [begin, end] intersects the window AND whose dictionary Bloom
    * summary admits the query (see [[DictBloom.admits]]) AND — when `tags`
    * is given — that carry at least one of the requested tags. An archive
    * with no Bloom summary (null column, pre-summary catalog, empty archive
    * with no var_dict) is never token-pruned — only a definitive Bloom miss
    * on a required exact dictionary token prunes. The tag rule is the
    * reference's scheduler filter (`query_scheduler.py:417-419`: archive id
    * IN archives tagged with ANY requested tag — an untagged archive is
    * EXCLUDED by a tag-scoped search, it can only be reached untagged).
    * Decided from catalog metadata alone; no archive directory opens for a
    * pruned archive. */
  /** The last fleet-prune decision: catalog size vs archives admitted —
    * the reference's scheduler logs the same numbers when it narrows the
    * archive list for a query (`query_scheduler.py:417-419` tag/time
    * filters). [[search]]/[[searchBatched]] stamp it into the Spark job
    * description, so the prune ratio rides the lineage of every job the
    * search triggers (UI / event logs); tests read it directly. */
  final case class PruneStats(total: Int, admissible: Int) {
    def pruned: Int = total - admissible
    def ratio: Double = if (total == 0) 0.0 else pruned.toDouble / total
    override def toString: String =
      f"$admissible/$total archives admitted (prune ratio $ratio%.3f)"
  }
  // thread-local, not a shared slot: concurrent searches in one JVM (an MCP
  // fleet server next to a background catalog search) would otherwise
  // overwrite each other between the prune decision and the job-description
  // stamp and misattribute the numbers
  private val lastPruneStatsTl = new ThreadLocal[Option[PruneStats]] {
    override def initialValue(): Option[PruneStats] = None
  }
  private[graft] def lastPruneStats: Option[PruneStats] = lastPruneStatsTl.get()

  def admissibleArchivesFor(spark: SparkSession, outDir: String, query: String,
                            caseSensitive: Boolean,
                            tsLo: Option[java.sql.Timestamp],
                            tsHi: Option[java.sql.Timestamp],
                            asOf: Option[Long] = None,
                            tags: Option[Seq[String]] = None): Seq[String] = {
    val cat = LakeTable.read(spark, s"$outDir/catalog", asOf)
    val cols = cat.columns.toSet
    val hasBloom = cols.contains("dict_bloom")
    val hasTags = cols.contains("tags")
    val selected = Seq("archive_id", "begin_ts", "end_ts") ++
      (if (hasBloom) Seq("dict_bloom") else Nil) ++
      (if (hasTags) Seq("tags") else Nil)
    val bloomAt = selected.indexOf("dict_bloom")
    val tagsAt = selected.indexOf("tags")
    val rows = cat.select(selected.map(col): _*).collect().toSeq
    val admitted = rows.collect {
      case r if {
        val (b, e) = (r.getTimestamp(1), r.getTimestamp(2))
        val tsOk = b == null || e == null ||
          (tsLo.forall(lo => !e.before(lo)) && tsHi.forall(hi => !b.after(hi)))
        val bloomOk = bloomAt < 0 || r.isNullAt(bloomAt) ||
          DictBloom.admits(r.getSeq[Long](bloomAt).toArray, query, caseSensitive)
        val tagOk = tags match {
          case None => true
          case Some(req) => tagsAt >= 0 && !r.isNullAt(tagsAt) &&
            r.getSeq[String](tagsAt).exists(req.contains)
        }
        tsOk && bloomOk && tagOk
      } => r.getString(0)
    }
    lastPruneStatsTl.set(Some(PruneStats(rows.size, admitted.size)))
    admitted
  }

  /** Fleet retention sweep — the reference's archive garbage collector
    * (`job_orchestration/garbage_collector/archive_garbage_collector.py:37-96`
    * and `docs/src/user-docs/guides-retention.md`): retire every archive
    * whose NEWEST event is older than `horizon`, metadata-first with a
    * durable deletion-candidates buffer so a crash anywhere resumes cleanly.
    *
    * Expiry rule (exactly the reference's `end_timestamp < %s AND
    * end_timestamp != 0` predicate): `end_ts` non-null and strictly before
    * `horizon`. Archives whose turns carry no timestamps have null bounds
    * and are NEVER age-retired — their age is unknowable, same as the
    * reference's `!= 0` guard.
    *
    * Crash-safety protocol (the reference's `DeletionCandidatesBuffer`
    * recovery file, re-ordered for an atomic catalog):
    *   1. heal: candidate ids from a previous crashed sweep that are NO
    *      LONGER in the committed catalog get their directories deleted
    *      (the previous sweep committed but died mid-delete); candidates
    *      still listed in the catalog are dropped (it died BEFORE the
    *      commit — their data is still live).
    *   2. persist the new candidate ids (tmp + rename);
    *   3. commit the pruned catalog (atomic [[LakeTable]] overwrite) — from
    *      this instant no new search routes to the retired archives;
    *   4. delete the retired archive directories;
    *   5. clear the buffer.
    * The heal step's membership test makes every interleaving safe: a
    * candidate is deletable iff the catalog no longer references it.
    *
    * Time travel: `asOf` reads of OLDER catalog snapshots still list retired
    * ids, but opening those archives fails once their dirs are gone —
    * retention bounds time travel, as on any lake. Pass
    * `expireCatalogSnapshots = Some(k)` to also drop all but the last `k`
    * catalog snapshots (cascades to [[LakeTable.expire]]).
    *
    * The horizon is the caller's policy knob: a deployment computes it as
    * `now - retention_period`, clamped by the oldest RUNNING query's start
    * time when a job table exists (the reference's
    * `_get_archive_safe_expiry_epoch`) or by the oldest pinned catalog
    * snapshot still in use.
    *
    * Returns the archive ids retired by THIS sweep (healed leftovers from a
    * crashed sweep are deleted but not re-reported — they were reported by
    * the sweep that committed them). */
  def retire(spark: SparkSession, outDir: String, horizon: java.sql.Timestamp,
             expireCatalogSnapshots: Option[Int] = None): Seq[String] = {
    val candidatesPath = new org.apache.hadoop.fs.Path(s"$outDir/_retention_candidates")
    val fs = candidatesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def archiveDir(id: String) = new org.apache.hadoop.fs.Path(s"$outDir/archives/$id")
    def deleteArchives(ids: Seq[String]): Unit =
      ids.foreach(id => fs.delete(archiveDir(id), true))
    def readCandidates(): Seq[String] =
      if (!fs.exists(candidatesPath)) Nil
      else {
        val in = fs.open(candidatesPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      }
    def writeCandidates(ids: Seq[String]): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(s"$outDir/_retention_candidates.tmp")
      val out = fs.create(tmp, true)
      try out.write(ids.mkString("\n").getBytes("UTF-8")) finally out.close()
      fs.delete(candidatesPath, false)
      require(fs.rename(tmp, candidatesPath), s"rename failed for $candidatesPath")
    }

    val registered = entries(spark, outDir).map(_._1).toSet

    // 1. heal a crashed previous sweep
    val leftover = readCandidates()
    if (leftover.nonEmpty) {
      deleteArchives(leftover.filterNot(registered.contains))
      fs.delete(candidatesPath, false)
    }

    // expiry scan over catalog metadata only (never data)
    val retired = entries(spark, outDir).collect {
      case (id, _, end) if end != null && end.before(horizon) => id
    }.toSeq.sorted
    if (retired.nonEmpty) {
      // 2. durable candidates; 3. atomic catalog commit; 4. delete; 5. clear
      writeCandidates(retired)
      val keep = LakeTable.read(spark, s"$outDir/catalog")
        .filter(!col("archive_id").isInCollection(retired))
      LakeTable.overwrite(spark, s"$outDir/catalog", keep)
      deleteArchives(retired)
      fs.delete(candidatesPath, false)
    }
    expireCatalogSnapshots.foreach(k =>
      LakeTable.expire(spark, s"$outDir/catalog", keepLast = k))
    retired
  }

  /** Cross-archive search: catalog-pruned per-archive plans (timestamp
    * window ∩ dictionary-Bloom token summary), one union — each branch runs
    * the full encoded-domain lifecycle (dict probe → sink prune → encoded
    * match → decode → verify) inside its own archive.
    *
    * Fan-out is BOUNDED: each admissible archive contributes one plan
    * branch, so a match-all query over a 10^4-archive fleet would otherwise
    * hand Catalyst a 10^4-branch union — minutes of driver-side analysis
    * and a driver-memory-sized plan before any task runs. Past `maxFanout`
    * admissible archives this refuses loudly (narrow the query / window)
    * and points at [[searchBatched]], which runs the same search in bounded
    * per-archive-batch steps — the reference throttles identically: its
    * query scheduler dispatches bounded archive batches per task
    * (`job_orchestration/scheduler/query/query_scheduler.py:508-566`). */
  def search(spark: SparkSession, outDir: String, query: String,
             caseSensitive: Boolean = true,
             tsLo: Option[java.sql.Timestamp] = None,
             tsHi: Option[java.sql.Timestamp] = None,
             asOf: Option[Long] = None,
             maxFanout: Int = 256,
             tags: Option[Seq[String]] = None): DataFrame = {
    val admissible =
      admissibleArchivesFor(spark, outDir, query, caseSensitive, tsLo, tsHi, asOf, tags)
    lastPruneStats.foreach(st =>
      spark.sparkContext.setJobDescription(s"ClpCatalog.search($query): $st"))
    require(admissible.size <= maxFanout,
      s"query admits ${admissible.size} archives (> maxFanout=$maxFanout); " +
        "narrow the query with a time range or more specific tokens, or use " +
        "ClpCatalog.searchBatched for a bounded-plan full-fleet scan")
    if (admissible.isEmpty) graft.search.ClpSearch.emptyResults(spark)
    else parallelPlans(spark, admissible) { id =>
      new graft.search.ClpSearch(spark, s"$outDir/archives/$id")
        .search(query, caseSensitive, tsLo, tsHi)
    }.reduce(_ unionAll _)
  }

  /** Builds per-archive plan branches CONCURRENTLY, preserving order. Plan
    * construction is the fleet search's measured fixed cost — each branch
    * runs a few independent driver-blocking dictionary/stats probe jobs
    * (~0.5 s/archive serial, `tools/FleetScaleProbe`), and Spark's scheduler
    * accepts jobs from multiple threads — so a bounded pool overlaps them;
    * this is the Spark analog of the reference dispatching per-archive
    * tasks to parallel workers (`query_scheduler.py:508-566`). Branch plans
    * and result contents are identical to the serial build ([[search]] /
    * [[searchBatched]] gates prove batched ≡ union ≡ oracle); the session
    * is pinned active on each pool thread so thread-local SQLConf reads
    * resolve to the session's conf, not defaults. */
  private[graft] def parallelPlans[A](spark: SparkSession, ids: Seq[String],
                                      width: Int = 8)(f: String => A): Seq[A] =
    if (ids.size <= 1) ids.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(width, ids.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.traverse(ids)(id =>
          Future(org.apache.spark.sql.GraftInternals.withActive(spark)(f(id)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }

  /** Full-fleet search with BOUNDED driver plans: admissible archives are
    * processed in fixed-size batches — each batch is one ≤`batchSize`-branch
    * union, executed and released before the next begins, its matches
    * appended to `resultDir` — so driver plan memory and Catalyst analysis
    * stay O(batchSize) no matter how many archives a match-all query
    * admits. This is the reference scheduler's bounded per-archive-batch
    * dispatch re-expressed (the batch loop is the job queue; the parquet
    * result dir is the results cache the reference streams batch results
    * into). Returns a reader over the accumulated results; `resultDir`
    * defaults to a fresh temp dir. */
  def searchBatched(spark: SparkSession, outDir: String, query: String,
                    caseSensitive: Boolean = true,
                    tsLo: Option[java.sql.Timestamp] = None,
                    tsHi: Option[java.sql.Timestamp] = None,
                    asOf: Option[Long] = None,
                    batchSize: Int = 64,
                    resultDir: Option[String] = None,
                    tags: Option[Seq[String]] = None): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val dir = resultDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-fleet-search").toString)
    val admissible =
      admissibleArchivesFor(spark, outDir, query, caseSensitive, tsLo, tsHi, asOf, tags)
    lastPruneStats.foreach(st =>
      spark.sparkContext.setJobDescription(s"ClpCatalog.searchBatched($query): $st"))
    // seed the dir with the (possibly empty) result schema so an all-pruned
    // fleet still answers an empty frame, not a missing-path error
    graft.search.ClpSearch.emptyResults(spark)
      .write.mode("overwrite").parquet(dir)
    admissible.grouped(batchSize).foreach { batch =>
      parallelPlans(spark, batch) { id =>
        new graft.search.ClpSearch(spark, s"$outDir/archives/$id")
          .search(query, caseSensitive, tsLo, tsHi)
      }.reduce(_ unionAll _)
        .write.mode("append").parquet(dir)
    }
    spark.read.parquet(dir)
  }

  // ------------------------------------------------- JSON-archive fleets
  // The same catalog over clp_s-style JSON archives ([[JsonPipeline]]), with
  // one extra per-archive summary: the MPT leaf set (`columns`, escaped
  // `path:type` strings from [[graft.search.KqlCompiler.leafSummary]]) — the
  // reference's external-SQL column index
  // (`clp_s/indexer/IndexManager.cpp` registers each archive's column
  // name/type pairs in MySQL so an external planner skips archives lacking a
  // queried column). A fleet KQL search prunes on it BEFORE any archive dir
  // opens, with the same conservatism as the Bloom rule: only a definitive
  // structural miss (a required filter whose pattern resolves to no leaf
  // under KqlCompiler's own namespace + wildcard path matching) prunes.

  /** Routes `jsonl` into one JSON archive per distinct `sliceCol` value and
    * registers each in the fleet catalog with ts bounds + MPT column set —
    * the JSON twin of [[ingest]] (same test-harness loop caveat). */
  def ingestJson(spark: SparkSession, jsonl: DataFrame, jsonCol: String,
                 sliceCol: Column, outDir: String,
                 metadata: Seq[(String, Column)] = Nil,
                 options: JsonPipeline.Options = JsonPipeline.Options(),
                 tagsFor: String => Seq[String] = _ => Nil): Unit = {
    val sliced = jsonl.withColumn("_slice",
      coalesce(sliceCol.cast("string"), lit("null")))
    val slices = sliced.select("_slice").distinct()
      .collect().map(_.getString(0)).sorted
    slices.foreach { sl =>
      JsonPipeline.route(spark,
        sliced.filter(col("_slice") === sl).drop("_slice"), jsonCol,
        s"$outDir/archives/arch_$sl", metadata, options)
    }
    LakeTable.overwrite(spark, s"$outDir/catalog", emptyCatalog(spark))
    slices.foreach(sl => appendJsonEntry(spark, outDir, s"arch_$sl", tagsFor(sl)))
  }

  /** The MPT leaf summary of one JSON archive's SEARCH FRAMES: per schema,
    * exactly the StructType [[JsonPipeline.kqlSearch]] compiles against
    * (metadata `$`-columns + `log_event_idx` + the derived record schema),
    * walked by [[graft.search.KqlCompiler.leafSummary]] — so the stored
    * summary and the real per-archive resolution can never drift. */
  private def jsonArchiveColumns(spark: SparkSession, archDir: String): Seq[String] = {
    import org.apache.spark.sql.types._
    val metaFields =
      try spark.read.parquet(s"$archDir/records").schema.fields.toSeq
        .filter(_.name.startsWith("$"))
      catch { case _: org.apache.spark.sql.AnalysisException => Nil } // empty archive
    val schemaJsons =
      spark.read.parquet(s"$archDir/table_schemas").select("spark_schema")
        .collect().map(_.getString(0)).toSeq
    schemaJsons.flatMap { js =>
      val st = DataType.fromJson(js).asInstanceOf[StructType]
      graft.search.KqlCompiler.leafSummary(StructType(
        metaFields ++ Seq(StructField("log_event_idx", LongType)) ++ st.fields))
    }.distinct.sorted
  }

  /** Register one finished JSON archive: ts bounds + message count rolled up
    * from its own schema catalog (metadata-only), plus the MPT column-set
    * summary — the JSON twin of [[appendEntry]]. */
  def appendJsonEntry(spark: SparkSession, outDir: String, archiveId: String,
                      tags: Seq[String] = Nil): Long = {
    val arch = s"$outDir/archives/$archiveId"
    val base = spark.read.parquet(s"$arch/schemas")
      .agg(timestamp_millis(min(col("min_ts"))).as("begin_ts"),
        timestamp_millis(max(col("max_ts"))).as("end_ts"),
        coalesce(sum(col("n_records")), lit(0L)).cast("long").as("n_messages"))
      .withColumn("archive_id", lit(archiveId))
      .select("archive_id", "begin_ts", "end_ts", "n_messages")
    val catCols = LakeTable.read(spark, s"$outDir/catalog").columns.toSet
    var entry = base
    if (catCols.contains("dict_bloom"))
      entry = entry.withColumn("dict_bloom", lit(null).cast("array<bigint>"))
    if (catCols.contains("tags"))
      entry = entry.withColumn("tags",
        (if (tags.isEmpty) lit(null) else typedLit(tags)).cast("array<string>"))
    if (catCols.contains("columns")) {
      val cols = jsonArchiveColumns(spark, arch)
      entry = entry.withColumn("columns", typedLit(cols).cast("array<string>"))
    }
    LakeTable.append(spark, s"$outDir/catalog", entry)
  }

  /** Archives a KQL query must open: ts window ∩ tags ∩ column-set summary
    * ([[graft.search.KqlCompiler.couldMatchLeaves]]). An archive with no
    * summary (null column, pre-summary catalog) is never column-pruned.
    * Decided from catalog metadata alone. `tsLo`/`tsHi` are epoch millis,
    * matching [[JsonPipeline.kqlSearch]]. */
  def admissibleArchivesForKql(spark: SparkSession, outDir: String, kql: String,
                               tsLo: Option[Long], tsHi: Option[Long],
                               asOf: Option[Long] = None,
                               tags: Option[Seq[String]] = None): Seq[String] = {
    val ast = graft.search.Kql.parse(kql) match {
      case Right(a) => a
      case Left(err) => throw new IllegalArgumentException(s"KQL parse error: $err")
    }
    val loTs = tsLo.map(ms => new java.sql.Timestamp(ms))
    val hiTs = tsHi.map(ms => new java.sql.Timestamp(ms))
    val cat = LakeTable.read(spark, s"$outDir/catalog", asOf)
    val cols = cat.columns.toSet
    val selected = Seq("archive_id", "begin_ts", "end_ts") ++
      (if (cols.contains("tags")) Seq("tags") else Nil) ++
      (if (cols.contains("columns")) Seq("columns") else Nil)
    val tagsAt = selected.indexOf("tags")
    val colsAt = selected.indexOf("columns")
    cat.select(selected.map(col): _*).collect().toSeq.collect {
      case r if {
        val (b, e) = (r.getTimestamp(1), r.getTimestamp(2))
        val tsOk = b == null || e == null ||
          (loTs.forall(lo => !e.before(lo)) && hiTs.forall(hi => !b.after(hi)))
        val tagOk = tags match {
          case None => true
          case Some(req) => tagsAt >= 0 && !r.isNullAt(tagsAt) &&
            r.getSeq[String](tagsAt).exists(req.contains)
        }
        val colOk = colsAt < 0 || r.isNullAt(colsAt) ||
          graft.search.KqlCompiler.couldMatchLeaves(ast, r.getSeq[String](colsAt))
        tsOk && tagOk && colOk
      } => r.getString(0)
    }
  }

  /** Union results across archives with [[JsonPipeline.kqlSearch]]'s own
    * projection-widening rule (name-sharing columns with irreconcilable
    * types: numeric→double, else string; struct/array stringified as JSON;
    * archive-absent columns null-filled) — first-seen column order. */
  private def widenUnion(parts: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.types._
    val outTypes = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    parts.foreach(_.schema.fields.foreach { f =>
      outTypes.get(f.name) match {
        case None => outTypes(f.name) = f.dataType
        case Some(prev) if prev == f.dataType => ()
        case Some(prev) =>
          val bothNumeric = Seq(prev, f.dataType).forall(t =>
            t == LongType || t == DoubleType || t.isInstanceOf[DecimalType])
          outTypes(f.name) = if (bothNumeric) DoubleType else StringType
      }
    })
    val aligned = parts.map { df =>
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(outTypes.toSeq.map { case (nm, dt) =>
        have.get(nm) match {
          case None => lit(null).cast(dt).as(nm)
          case Some(src) =>
            val c = col(graft.search.KqlCompiler.quoteName(nm))
            val cast =
              if (src == dt) c
              else if (dt == StringType && (src.isInstanceOf[StructType] ||
                src.isInstanceOf[ArrayType])) to_json(c)
              else c.cast(dt)
            cast.as(nm)
        }
      }: _*)
    }
    aligned.reduce(_ unionAll _)
  }

  /** Fleet KQL search over JSON archives: column-set + ts + tag pruning from
    * catalog metadata, then one [[JsonPipeline.kqlSearch]] per admissible
    * archive (each with its own schema-pruned per-schema plans), widened into
    * one result. Fan-out bounded exactly like [[search]]. */
  def searchKql(spark: SparkSession, outDir: String, kql: String,
                selectCols: Seq[String],
                tsLo: Option[Long] = None, tsHi: Option[Long] = None,
                asOf: Option[Long] = None,
                maxFanout: Int = 256,
                tags: Option[Seq[String]] = None): DataFrame = {
    val admissible =
      admissibleArchivesForKql(spark, outDir, kql, tsLo, tsHi, asOf, tags)
    require(admissible.size <= maxFanout,
      s"query admits ${admissible.size} archives (> maxFanout=$maxFanout); " +
        "narrow the query with a time range, tags, or more specific columns")
    if (admissible.isEmpty) {
      import org.apache.spark.sql.types._
      // type the empty frame from catalog metadata alone (no archive dir
      // opens — the point of the prune): each archive's stored leaf summary
      // rebuilds its search-frame schema, selectCols resolve through the
      // SAME projection walk the real path uses, and per-archive schemas
      // widen under the same rule — so unioning this frame with a
      // non-empty window's result of the same query stays type-compatible.
      // Superset semantics: the universe is ALL cataloged archives (which
      // archives a non-empty search would have admitted is unknowable
      // here). Pre-summary catalogs fall back to all-string selectCols.
      val cat = LakeTable.read(spark, s"$outDir/catalog", asOf)
      val parts =
        if (!cat.columns.contains("columns")) Nil
        else cat.select("columns").collect().toSeq.collect {
          case r if !r.isNullAt(0) =>
            val schema = graft.search.KqlCompiler
              .schemaFromLeafSummary(r.getSeq[String](0))
            val resolved =
              graft.search.KqlCompiler.resolveProjection(schema, selectCols)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(resolved.map { case (nm, dt) => StructField(nm, dt) }))
        }.filter(_.schema.fields.nonEmpty)
      if (parts.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(selectCols.filterNot(_.contains("*"))
            .map(c => StructField(c, StringType))))
      else widenUnion(parts)
    } else widenUnion(parallelPlans(spark, admissible)(id =>
      JsonPipeline.kqlSearch(spark, s"$outDir/archives/$id", kql, selectCols,
        tsLo, tsHi)))
  }

  // ------------------------------------------------------------- datasets
  // The reference's dataset namespaces (clp_metadata_db_utils.py:127-181:
  // a `datasets` registry table plus a FULL per-dataset set of metadata
  // tables named `<prefix><dataset>_<suffix>`, archives stored under
  // `<storage>/<dataset>`): here a deployment ROOT holds a snapshot-
  // versioned `_datasets` registry and one complete, independent catalog
  // directory per dataset — ingest, tags, Bloom summaries, retention and
  // searches are all dataset-scoped, and one dataset's sweep can never
  // touch another's archives.

  private val DatasetNameRule = "^[A-Za-z0-9_-]{1,64}$".r

  /** Resolve a dataset's catalog directory under `root` (name validated —
    * the name becomes a path segment, so it must not traverse). */
  def datasetDir(root: String, name: String): String = {
    require(DatasetNameRule.matches(name),
      s"invalid dataset name '$name' (allowed: [A-Za-z0-9_-]{1,64})")
    s"$root/$name"
  }

  /** Register a dataset (idempotent) and answer its catalog directory —
    * the reference's `add_dataset` row + per-dataset table creation. */
  def addDataset(spark: SparkSession, root: String, name: String): String = {
    val dir = datasetDir(root, name)
    if (!datasets(spark, root).contains(name))
      LakeTable.append(spark, s"$root/_datasets",
        spark.range(1).select(lit(name).as("name")))
    dir
  }

  /** All registered dataset names — `fetch_existing_datasets`. */
  def datasets(spark: SparkSession, root: String): Seq[String] =
    LakeTable.snapshot(spark, s"$root/_datasets") match {
      case None => Nil
      case Some(_) => LakeTable.read(spark, s"$root/_datasets")
        .collect().map(_.getString(0)).toSeq.sorted
    }

  /** Dataset-scoped fleet search: refuses an unregistered dataset loudly
    * (the reference errors on a nonexistent dataset rather than answering
    * empty) and otherwise runs [[search]] inside that dataset's catalog. */
  def searchDataset(spark: SparkSession, root: String, dataset: String,
                    query: String, caseSensitive: Boolean = true,
                    tsLo: Option[java.sql.Timestamp] = None,
                    tsHi: Option[java.sql.Timestamp] = None,
                    asOf: Option[Long] = None,
                    maxFanout: Int = 256,
                    tags: Option[Seq[String]] = None): DataFrame = {
    val known = datasets(spark, root)
    require(known.contains(dataset),
      s"unknown dataset '$dataset' (registered: ${known.mkString(", ")})")
    search(spark, datasetDir(root, dataset), query, caseSensitive,
      tsLo, tsHi, asOf, maxFanout, tags)
  }
}

package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * The SURVEY §7 lake shim: no Iceberg jars ship in this environment, so
 * archive sinks are partitioned parquet managed by this thin snapshot
 * layer that keeps Iceberg's WRITE API SHAPE — `append`/`overwrite`
 * produce numbered snapshots whose manifests list exactly the data files
 * that commit, readers resolve a snapshot (latest or time-travel `asOf`)
 * and read only its files, and a crash between data-file write and commit
 * leaves orphans that no reader ever sees. A real Iceberg catalog drops
 * in by replacing the pointer swap with a catalog commit.
 *
 * Layout under `dir`:
 *   data/<uuid>-part-*.parquet      immutable data files (never rewritten)
 *   _snapshots/v<id>.json           manifest: files + rows + schema JSON
 *   _snapshots/CURRENT              pointer file holding the committed id
 *
 * Commit protocol (single writer, the reference's per-archive model):
 * write data files → write manifest v(N+1) → atomically swap CURRENT
 * (rename, atomic on HDFS/local; an object store would use the catalog
 * swap instead, as Iceberg does). Readers load CURRENT → manifest → files;
 * any crash before the swap is invisible. Unreferenced files from crashed
 * attempts or expired snapshots are reclaimed by [[expire]].
 */
object LakeTable {

  final case class Snapshot(id: Long, files: Seq[String], rows: Long,
                            schemaJson: String)

  /** How old an orphan manifest (above CURRENT) must be before a new commit
    * may heal (replace) it — see the concurrency note in commitManifest. */
  private val OrphanGraceMs: Long =
    sys.props.get("graft.lake.orphanGraceMs").map(_.toLong).getOrElse(60000L)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def asNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def currentId(spark: SparkSession, dir: String): Option[Long] = {
    val cur = new Path(s"$dir/_snapshots/CURRENT")
    val f = fs(spark, cur)
    if (!f.exists(cur)) None
    else {
      val in = f.open(cur)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  def snapshot(spark: SparkSession, dir: String, asOf: Option[Long] = None): Option[Snapshot] = {
    val cur = currentId(spark, dir)
    val id = asOf.orElse(cur).getOrElse(return None)
    // committedness is defined by CURRENT, not by manifest existence: a
    // crashed commit leaves an orphan manifest above CURRENT that no read
    // path (latest, time travel, or expire) may ever treat as a snapshot
    if (asOf.exists(a => cur.forall(a > _)))
      throw new IllegalArgumentException(s"no committed snapshot $id in $dir")
    val mf = new Path(f"$dir/_snapshots/v$id%08d.json")
    val f = fs(spark, mf)
    if (!f.exists(mf))
      throw new IllegalArgumentException(s"no snapshot $id in $dir")
    val in = f.open(mf)
    val json = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8) finally in.close()
    // manifest fields are this file's own writes — a flat regex parse keeps
    // the shim dependency-free (same trade as Lineage manifests); a
    // truncated/corrupt manifest must name the file, not NPE
    def field(o: Option[scala.util.matching.Regex.Match], what: String) =
      o.getOrElse(throw new IllegalStateException(
        s"malformed manifest $mf: missing $what"))
    val rows = field(""""rows":\s*(\d+)""".r.findFirstMatchIn(json), "rows")
      .group(1).toLong
    val files = """"file":\s*"([^"]+)"""".r.findAllMatchIn(json).map(_.group(1)).toSeq
    val schema = field(
      """"schema":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json), "schema")
      .group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    Some(Snapshot(id, files, rows, schema))
  }

  /** All committed snapshot ids, ascending — bounded by CURRENT, so an
    * orphan manifest from a crashed commit is never listed (and [[expire]],
    * which derives its keep-set from this, can never mistake one for the
    * newest snapshot and delete committed data). */
  def snapshots(spark: SparkSession, dir: String): Seq[Long] = {
    val cur = currentId(spark, dir).getOrElse(return Nil)
    val sd = new Path(s"$dir/_snapshots")
    val f = fs(spark, sd)
    if (!f.exists(sd)) Nil
    else f.listStatus(sd).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .filter(_ <= cur)
      .toSeq.sorted
  }

  def append(spark: SparkSession, dir: String, df: DataFrame): Long =
    commit(spark, dir, df, keepPrevFiles = true)

  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Long =
    commit(spark, dir, df, keepPrevFiles = false)

  private def commit(spark: SparkSession, dir: String, df: DataFrame,
                     keepPrevFiles: Boolean): Long = {
    val prev = snapshot(spark, dir)
    // an append whose schema drifts from the table's would read back as
    // silent nulls over the old files — refuse it (schema evolution is a
    // real catalog's job); overwrite replaces the file set, so it may
    // change the schema freely
    if (keepPrevFiles) prev.filter(_.files.nonEmpty).foreach { p =>
      require(asNullable(df.schema).json == p.schemaJson,
        s"append schema ${df.schema.simpleString} does not match table $dir")
    }
    val (commitId, newFiles, newRows) = stageData(spark, dir, df, df.schema)
    val files = (if (keepPrevFiles) prev.map(_.files).getOrElse(Nil) else Nil) ++ newFiles
    val rows = (if (keepPrevFiles) prev.map(_.rows).getOrElse(0L) else 0L) + newRows
    val id = prev.map(_.id).getOrElse(0L) + 1L
    // Spark reads file sources as nullable regardless of the writer's
    // schema — store the relaxed form so read-back equals the manifest
    commitManifest(spark, dir, id, files, rows, asNullable(df.schema).json, commitId)
    id
  }

  /** Writes `df` into a fresh immutable staging subdir under `dir/data/`
    * (one rename-free parquet job — data files are never touched after
    * this, so concurrent readers of older snapshots stay correct) and
    * returns (commitId, relative file names, footer-counted rows). */
  private def stageData(spark: SparkSession, dir: String, df: DataFrame,
                        readSchema: StructType): (String, Seq[String], Long) = {
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val staging = s"$dir/data/$commitId"
    df.write.parquet(staging)
    val stPath = new Path(staging)
    val f = fs(spark, stPath)
    val newFiles = f.listStatus(stPath).iterator.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && !p.getName.endsWith(".crc"))
      .map(p => s"data/$commitId/${p.getName}").toSeq.sorted
    val newRows = spark.read.schema(readSchema)
      .parquet(newFiles.map(n => s"$dir/$n"): _*).count()
    (commitId, newFiles, newRows)
  }

  private def commitManifest(spark: SparkSession, dir: String, id: Long,
                             files: Seq[String], rows: Long, schemaJson: String,
                             commitId: String): Unit = {
    val schemaEsc = schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")
    val manifest =
      s"""{"snapshot": $id, "commit": "$commitId", "rows": $rows, "schema": "$schemaEsc",
         | "manifest_entries": [${files.map(x => s"""{"file": "$x"}""").mkString(", ")}]}""".stripMargin
    val mf = new Path(f"$dir/_snapshots/v$id%08d.json")
    val f = fs(spark, mf)
    f.mkdirs(mf.getParent)
    // optimistic concurrency: the no-overwrite manifest create IS the id
    // reservation — of two concurrent committers that both computed this id,
    // the second create fails LOUDLY (caller retries on a fresh snapshot
    // read) instead of silently overwriting the winner's manifest and
    // losing its commit. The one existing-file case that may be replaced is
    // an orphan above CURRENT (a crashed commit that never swapped the
    // pointer): delete it and reserve again.
    // FS requirement: the _snapshots dir must live on a filesystem with
    // atomic no-overwrite create (HDFS, posix local). Object stores whose
    // create is check-then-write (raw S3A) can let two racers both "win" —
    // there, this swap must be replaced by a catalog/conditional-put commit,
    // exactly as Iceberg does.
    def writeManifest(): Unit = {
      val out = f.create(mf, false)
      try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
    try writeManifest()
    catch { case e: java.io.IOException =>
      // only an already-exists conflict routes into the heal path; a
      // transient create/write failure (network, disk) must surface as
      // itself, not masquerade as a concurrent commit. Hadoop signals the
      // conflict as FileAlreadyExistsException; the exists() fallback covers
      // FS implementations that still raise a bare IOException for it.
      if (!e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] &&
          !f.exists(mf)) throw e
      require(currentId(spark, dir).forall(id > _),
        s"concurrent commit detected: snapshot $id already committed in $dir")
      // an existing manifest ABOVE CURRENT is either a crashed commit's
      // orphan or a concurrent winner that has not yet swapped the pointer
      // — indistinguishable by state alone, so only a manifest older than
      // the grace window is healed; a fresh one fails loudly (a live winner
      // swaps CURRENT within the window; this loser retries on a fresh
      // snapshot read and then trips the id-already-committed require)
      val age = System.currentTimeMillis() - f.getFileStatus(mf).getModificationTime
      require(age > OrphanGraceMs,
        s"concurrent commit in flight for snapshot $id in $dir " +
          s"(manifest ${age}ms old < ${OrphanGraceMs}ms grace)")
      f.delete(mf, false)
      writeManifest()
    }
    // the commit point: CURRENT flips via write-temp + overwrite-rename —
    // FileContext.rename(OVERWRITE) is atomic on HDFS and posix local, so a
    // reader sees the old pointer or the new one, never an absent/partial
    // file (an Iceberg catalog replaces exactly this swap)
    val tmp = new Path(s"$dir/_snapshots/.CURRENT.$commitId")
    val o2 = f.create(tmp, true)
    try o2.write(id.toString.getBytes(StandardCharsets.UTF_8)) finally o2.close()
    val cur = new Path(s"$dir/_snapshots/CURRENT")
    org.apache.hadoop.fs.FileContext.getFileContext(cur.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // post-swap self-check: if THIS committer stalled past the grace window
    // between its manifest reservation and the swap, a concurrent committer
    // may have healed (replaced) the manifest as a presumed orphan and
    // swapped CURRENT to the SAME id — this committer's rename then succeeds
    // while its staged files are absent from the committed manifest. The
    // manifest carries its committer's id precisely so that case fails
    // loudly here instead of both callers reporting success.
    val committed = """"commit":\s*"([^"]+)"""".r
    val in2 = f.open(mf)
    val json2 = try new String(org.apache.commons.io.IOUtils.toByteArray(in2),
      StandardCharsets.UTF_8) finally in2.close()
    val owner = committed.findFirstMatchIn(json2).map(_.group(1))
    require(owner.contains(commitId),
      s"commit $commitId of snapshot $id in $dir was replaced by a concurrent " +
        s"committer (manifest now owned by ${owner.getOrElse("<missing>")}); " +
        "this commit's rows are NOT in the table — retry the append")
  }

  /** Bin-pack small data files into ~`targetBytes` files and commit the
    * result as a NEW snapshot with identical content — the maintenance op a
    * streaming-append table needs at scale (each micro-batch commit lands a
    * few small files; unmaintained, a year of 30 s batches is 10^6 files
    * whose per-file open/footer cost dominates every scan). Files at or
    * above `smallBytes` are adopted untouched (never rewritten — compaction
    * cost is proportional to the SMALL tail, not the table); files below it
    * are read once and rewritten `coalesce`d (no shuffle) into
    * ceil(smallTotal / targetBytes) outputs. Readers of older snapshots are
    * unaffected (the replaced files stay on disk until [[expire]]); a crash
    * mid-compaction leaves only invisible staged files, same as any commit.
    *
    * Returns the new snapshot id, or the current one if fewer than two
    * files qualify (nothing to pack). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L << 20, smallBytes: Long = 96L << 20): Long = {
    val prev = snapshot(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $dir"))
    val f = fs(spark, new Path(dir))
    val sized = prev.files.map(rel =>
      rel -> f.getFileStatus(new Path(s"$dir/$rel")).getLen)
    val (small, kept) = sized.partition(_._2 < smallBytes)
    if (small.size < 2) return prev.id
    val schema = DataType.fromJson(prev.schemaJson).asInstanceOf[StructType]
    val smallTotal = small.map(_._2).sum
    val nOut = math.max(1L, (smallTotal + targetBytes - 1) / targetBytes).toInt
    // row-preservation audit before the commit ever becomes visible — both
    // counts are parquet-footer metadata reads, no data scan
    val (commitId, newFiles, newRows) = stageData(spark, dir,
      spark.read.schema(schema).parquet(small.map(s => s"$dir/${s._1}"): _*)
        .coalesce(nOut), schema)
    val keptRows = if (kept.isEmpty) 0L
      else spark.read.schema(schema).parquet(kept.map(k => s"$dir/${k._1}"): _*).count()
    require(newRows + keptRows == prev.rows,
      s"compaction row mismatch in $dir: ${newRows + keptRows} != ${prev.rows}")
    val id = prev.id + 1L
    commitManifest(spark, dir, id, (kept.map(_._1) ++ newFiles).sorted,
      prev.rows, prev.schemaJson, commitId)
    id
  }

  /** Read the table at the committed snapshot (`asOf` for time travel).
    * An uncommitted dir reads as an empty, schema-less error — callers
    * create tables by committing, same as a catalog. */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val s = snapshot(spark, dir, asOf)
      .getOrElse(throw new IllegalArgumentException(s"no committed snapshot in $dir"))
    val schema = DataType.fromJson(s.schemaJson).asInstanceOf[StructType]
    if (s.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(s.files.map(n => s"$dir/$n"): _*)
  }

  /** Reclaim space: drop all snapshots but the newest `keepLast` and delete
    * every data file no retained snapshot references — including orphans
    * from crashed commits (staged files whose manifest never committed). */
  def expire(spark: SparkSession, dir: String, keepLast: Int = 1): Unit = {
    val ids = snapshots(spark, dir)
    if (ids.isEmpty) return
    val keep = ids.takeRight(math.max(keepLast, 1)).toSet
    val live: Set[String] = keep.flatMap(id =>
      snapshot(spark, dir, Some(id)).map(_.files.toSet).getOrElse(Set.empty[String]))
    val dataDir = new Path(s"$dir/data")
    val f = fs(spark, dataDir)
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val doomed = scala.collection.mutable.Buffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toString.stripPrefix(
          f.makeQualified(new Path(dir)).toString).stripPrefix("/")
        if (st.isFile && !live.contains(rel)) doomed += st.getPath
      }
      doomed.foreach(f.delete(_, false))
      // staging subdirs emptied above (crashed attempts, expired commits)
      f.listStatus(dataDir).iterator.filter(_.isDirectory)
        .filter(d => f.listStatus(d.getPath).isEmpty)
        .foreach(d => f.delete(d.getPath, false))
    }
    ids.filterNot(keep).foreach(id =>
      f.delete(new Path(f"$dir/_snapshots/v$id%08d.json"), false))
  }
}

package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.{ClpPipeline, TranscriptGen}

class ClpPipelineSpec extends SparkSpecBase {

  private lazy val outDir = Files.createTempDirectory("graft-pipe").toString
  private lazy val turns = TranscriptGen.turns(spark, 4000, seed = 42L).toDF.cache()
  private lazy val cfg = ClpPipeline.Config(outDir, maxSinks = 8, saltParts = 16, filesPerSink = 4)
  private lazy val result = ClpPipeline.run(spark, turns, cfg)

  test("pipeline routes every turn exactly once") {
    assert(result.turnsIn > 3000)
    assert(result.rowsRouted == result.turnsIn)
    // one source template can yield several logtypes (e.g. a hex slot that
    // sometimes renders all-digits encodes as int, else as dict var), so the
    // bound is a small multiple of the template count
    assert(result.nLogtypes > 10 && result.nLogtypes <= 8L * TranscriptGen.Templates.length)
    assert(result.nVars > 0)
  }

  test("per-sink counts sum to the input count and match a direct groupBy") {
    result // force
    val routed = spark.read.parquet(s"$outDir/routed")
    val stats = spark.read.parquet(s"$outDir/sink_stats")
    assert(stats.agg(sum("n_rows")).head.getLong(0) == result.turnsIn)
    val direct = routed.groupBy("sink_id").count()
    val joined = stats.join(direct, "sink_id")
      .filter(col("n_rows") =!= col("count")).count()
    assert(joined == 0)
    // hot templates own their sinks; long tail shares sink 0
    assert(stats.count() <= cfg.maxSinks)
  }

  test("decode(template, vars) reproduces every turn's text byte-for-byte") {
    result // force
    val violations = ClpPipeline.roundTripViolations(spark, turns, outDir)
    assert(violations.count() == 0)
  }

  test("dictionary IDs are dense, deterministic, and sorted by value") {
    result // force
    val vd = spark.read.parquet(s"$outDir/var_dict").orderBy("var_id").collect()
    assert(vd.map(_.getLong(0)).toSeq == vd.indices.map(_.toLong))
    val values = vd.map(_.getString(1))
    assert(values.sameElements(values.sorted))
    // rebuilding under different parallelism yields identical IDs
    val parsed2 = ClpPipeline.parse(turns.repartition(13))
    val vd2 = ClpPipeline.buildVarDict(parsed2, cfg).orderBy("var_id").collect()
    assert(vd2.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      vd.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("resume skips completed stages and reproduces identical outputs") {
    result // force the first full run
    val statsBefore = spark.read.parquet(s"$outDir/sink_stats")
      .orderBy("sink_id").collect().toSeq
    val res2 = ClpPipeline.run(spark, turns, cfg.copy(resume = true))
    assert(res2.rowsRouted == result.rowsRouted)
    val statsAfter = spark.read.parquet(s"$outDir/sink_stats")
      .orderBy("sink_id").collect().toSeq
    assert(statsBefore == statsAfter)
  }

  test("a finished archive drops the parsed checkpoint; resume still answers from lineage") {
    result // force the first full run
    // the parsed stage output is a second full copy of the corpus — a
    // COMPLETE archive must not keep it (keepParsed=false default)...
    assert(!Files.exists(java.nio.file.Paths.get(s"$outDir/parsed")))
    // ...and a resumed run on the trimmed archive still reports exact
    // turnsIn (from the parse manifest), touching no stage data
    val res2 = ClpPipeline.run(spark, turns, cfg.copy(resume = true))
    assert(res2.turnsIn == result.turnsIn && res2.rowsRouted == result.rowsRouted)
  }

  test("crash mid-stage resumes to an archive identical to an uninterrupted run") {
    result // reference: the uninterrupted archive in outDir
    val out2 = Files.createTempDirectory("graft-pipe-crash").toString
    val cfg2 = cfg.copy(outDir = out2, keepParsed = true)
    ClpPipeline.run(spark, turns, cfg2)
    // simulate dying mid-route: the route/stats manifests were never
    // written, the routed dir holds a half-finished attempt (some files
    // missing, one orphan junk part file from the dead writer)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$out2/_lineage/route.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$out2/_lineage/stats.json"))
    def partFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap(f =>
        if (f.isDirectory) partFiles(f)
        else if (f.getName.startsWith("part-")) Seq(f) else Nil)
    val parts = partFiles(new java.io.File(s"$out2/routed")).sortBy(_.getPath)
    assert(parts.length > 1)
    parts.take(parts.length / 2).foreach(f => assert(f.delete()))
    java.nio.file.Files.write(
      parts.last.toPath.resolveSibling("part-99999-dead-attempt.snappy.parquet"),
      Array.fill[Byte](64)(0x5A))
    val res = ClpPipeline.run(spark, turns, cfg2.copy(resume = true, keepParsed = false))
    assert(res.turnsIn == result.turnsIn && res.rowsRouted == result.rowsRouted)
    // the healed archive equals the uninterrupted one: dictionaries,
    // per-sink stats, and byte-exact round-trip
    def rows(dir: String, tbl: String, order: String) =
      spark.read.parquet(s"$dir/$tbl").orderBy(order).collect().toSeq
    assert(rows(out2, "var_dict", "var_id") == rows(outDir, "var_dict", "var_id"))
    assert(rows(out2, "logtype_dict", "logtype_id") == rows(outDir, "logtype_dict", "logtype_id"))
    assert(rows(out2, "sink_stats", "sink_id").map(_.toString).sorted ==
      rows(outDir, "sink_stats", "sink_id").map(_.toString).sorted)
    assert(ClpPipeline.roundTripViolations(spark, turns, out2).count() == 0)
  }

  test("pre-metric parse manifests backfill input_rows before the checkpoint drops") {
    val out2 = Files.createTempDirectory("graft-pipe-old").toString
    val cfg2 = cfg.copy(outDir = out2, keepParsed = true)
    ClpPipeline.run(spark, turns, cfg2) // keepParsed: checkpoint retained
    // simulate an archive written before input_rows was recorded
    val manifest = java.nio.file.Paths.get(s"$out2/_lineage/parse.json")
    java.nio.file.Files.write(manifest,
      """{"stage": "parse", "status": "COMPLETE", "duration_ms": 1}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val res = ClpPipeline.run(spark, turns, cfg2.copy(resume = true, keepParsed = false))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out2/parsed")))
    // turnsIn must survive the drop (from the backfilled manifest) on the
    // NEXT resume too — without the backfill this read would crash
    val res2 = ClpPipeline.run(spark, turns, cfg2.copy(resume = true, keepParsed = false))
    assert(res.turnsIn == result.turnsIn && res2.turnsIn == result.turnsIn)
  }

  test("enrichment join annotates every row that has a lookup match") {
    result // force
    val routed = spark.read.parquet(s"$outDir/routed")
    assert(routed.filter(col("team").isNull).count() == 0)
  }

  test("fully distributed dictionary path (driverDictThreshold=0) reproduces the broadcast archive") {
    result // force the broadcast-path run first
    val out2 = Files.createTempDirectory("graft-pipe-dist").toString
    // threshold 0 forces count-gated distributed ID assignment, the hot-head
    // (3 entries) + shuffle-join-tail resolution, and distributed decode —
    // the end-to-end no-driver-map mode
    val res2 = ClpPipeline.run(spark, turns,
      cfg.copy(outDir = out2, driverDictThreshold = 0L, hotHeadSize = 3))
    assert(res2.rowsRouted == result.turnsIn)
    assert(res2.nVars == result.nVars && res2.nLogtypes == result.nLogtypes)
    // dictionaries identical to the driver-path build (rank-by-value IDs are
    // path- and parallelism-invariant)
    def dict(dir: String, name: String, idc: String, vc: String) =
      spark.read.parquet(s"$dir/$name").select(idc, vc).orderBy(idc)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dict(out2, "var_dict", "var_id", "value") ==
      dict(outDir, "var_dict", "var_id", "value"))
    assert(dict(out2, "logtype_dict", "logtype_id", "logtype") ==
      dict(outDir, "logtype_dict", "logtype_id", "logtype"))
    // routed rows identical
    def routedSet(dir: String) = spark.read.parquet(s"$dir/routed")
      .select("conv_id", "turn_idx", "logtype_id", "sink_id", "vars").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getAs[Number]("sink_id").intValue, r.getSeq[Long](4).mkString(","))).toSet
    assert(routedSet(out2) == routedSet(outDir))
    // byte-exact decode through the distributed (no-driver-map) decode join
    assert(ClpPipeline.roundTripViolations(spark, turns, out2,
      driverDictThreshold = 0L).count() == 0)
  }

  test("partition lineage covers all routed rows") {
    result // force
    val lin = spark.read.parquet(s"$outDir/lineage_partitions")
    assert(lin.agg(sum("n_rows")).head.getLong(0) == result.rowsRouted)
  }

  test("archival parquet profile (zstd-9 + v2 pages) round-trips and shrinks the archive") {
    result // force the default (snappy/v1) run first
    val out2 = Files.createTempDirectory("graft-pipe-zstd").toString
    val res2 = ClpPipeline.run(spark, turns, cfg.copy(outDir = out2,
      parquetOptions = Map(
        "compression" -> "zstd",
        "parquet.compression.codec.zstd.level" -> "9",
        "parquet.writer.version" -> "v2")))
    assert(res2.rowsRouted == result.rowsRouted)
    // the archive stays a plain parquet table: byte-exact decode over it
    assert(ClpPipeline.roundTripViolations(spark, turns, out2).count() == 0)
    // and the options actually reached the writer: same rows, fewer bytes
    def bytes(dir: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.endsWith(".parquet"))
        .mapToLong(p => p.toFile.length).sum
    assert(bytes(s"$out2/routed") < bytes(s"$outDir/routed"))
  }
}

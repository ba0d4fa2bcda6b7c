package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.{ClpPipeline, TranscriptGen}

/**
 * Multi-executor scaling evidence, submitted via `spark-submit` against a
 * real standalone cluster (see `tools/cluster_bench.sh`). The BASELINE.json
 * rule asks for the pipeline "run via spark-submit on a multi-executor
 * cluster at two cluster sizes (N and 4N executors)"; `graft.Bench` evidences
 * the ratio with local[N] threads inside one JVM, this main evidences it with
 * separate executor PROCESSES — real netty shuffle, real serialization, real
 * per-executor heaps — at `spark.cores.max`-controlled cluster sizes
 * (2-core executors: cores.max=2 → 1 executor, cores.max=8 → 4 executors).
 *
 * Modes (the master URL comes from spark-submit, never set here):
 *   gen <turnsDir> <nTurns>            — write the deterministic corpus once
 *   run <turnsDir> <workDir> [burnMs]  — warm-up run + calibration burn +
 *                                        ONE timed pipeline rep; prints one
 *                                        JSON line with cores/executors/sec
 *
 * One rep per submission keeps the legs interleavable from the driver script
 * (hi,lo,hi,lo,… across fresh JVMs) so both cluster sizes sample the same
 * hypervisor noise windows, exactly like Bench's interleaved legs.
 */
object ClusterBench {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-cluster-bench")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // same local-scale IO/AQE tuning as graft.Bench (cluster-scale defaults
    // would collapse the few-hundred-MB corpus into a handful of tasks).
    // Cores come from the spark.cores.max conf, NOT defaultParallelism:
    // right after getOrCreate no executor has registered yet, so
    // defaultParallelism still reads its floor of 2 and would kneecap the
    // shuffle tuning of the 8-core leg.
    val cores = grantedCores(s)
    s.conf.set("spark.sql.shuffle.partitions", (cores * 2).toString)
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8 * 1024 * 1024).toString)
    s.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
    s.conf.set("spark.sql.files.openCostInBytes", (512 * 1024).toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    s.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    graft.functions.ClpFunctions.register(s)
    s
  }

  /** Cluster size this submission was granted (spark.cores.max on
   *  standalone; local[N] thread count when run without a master). */
  private def grantedCores(s: SparkSession): Int =
    s.conf.getOption("spark.cores.max").map(_.toInt)
      .getOrElse(s.sparkContext.defaultParallelism)

  /** Block until `want` executor processes have registered (driver row
   *  excluded), so the timed rep never starts on a partially-up cluster and
   *  the reported executor count is the real one. */
  private def awaitExecutors(s: SparkSession, want: Int, timeoutMs: Long = 90000L): Int = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var n = 0
    while ({
      n = s.sparkContext.statusTracker.getExecutorInfos.length - 1
      n < want && System.nanoTime() < deadline
    }) Thread.sleep(200)
    n
  }

  private def runPipeline(spark: SparkSession, turnsDir: String, outDir: String,
                          limit: Long = 0L): Double = {
    val t0 = System.nanoTime()
    var turns = spark.read.parquet(turnsDir)
    if (limit > 0) turns = turns.limit(limit.toInt)
    ClpPipeline.run(spark, turns,
      ClpPipeline.Config(outDir, maxSinks = 64, saltParts = 64,
        filesPerSink = math.max(spark.sparkContext.defaultParallelism / 4, 4)))
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: turnsDir :: nTurns :: Nil =>
      val spark = session()
      TranscriptGen.turns(spark, nTurns.toLong, seed = 42L, partitions = 32)
        .write.mode("overwrite").parquet(turnsDir)
      println(s"""{"cluster_gen":{"turns":${spark.read.parquet(turnsDir).count()}}}""")
      spark.stop()

    case "run" :: turnsDir :: workDir :: rest =>
      val burnMs = rest.headOption.map(_.toLong).getOrElse(8000L)
      val spark = session()
      val cores = grantedCores(spark)
      // tools/cluster_bench.sh fixes spark.executor.cores, so the expected
      // executor count is cores.max / executor.cores (2-core executors pair
      // 1-vs-4 executors; 1-core executors pair 2-vs-8 — the literal
      // N-vs-4N-executors reading, with cross-process shuffle on BOTH legs)
      val perExec = spark.conf.getOption("spark.executor.cores").map(_.toInt).getOrElse(2)
      // local masters have no separate executor processes — getExecutorInfos
      // holds only the driver row, so waiting would burn the whole timeout
      val executors =
        if (spark.sparkContext.master.startsWith("local")) 0
        else awaitExecutors(spark, want = cores / perExec)
      val nTurns = spark.read.parquet(turnsDir).count()
      runPipeline(spark, turnsDir, s"$workDir/warmup", limit = 200000L) // JIT
      // Hardware-health calibration on the (otherwise idle) driver JVM.
      // Fixed 4 threads regardless of leg size so hi and lo burn samples are
      // directly comparable — the burn measures the box, not the cluster.
      graft.Bench.burn(2, 1000) // burn JIT warm-up, discarded
      val burnIps = graft.Bench.burn(4, burnMs)
      val sec = runPipeline(spark, turnsDir, s"$workDir/out")
      println(f"""{"cluster_run":{"total_cores":$cores,"executors":$executors,"turns":$nTurns,"sec":$sec%.2f,"thr":${nTurns / sec}%.1f,"burn_miters_per_sec":${burnIps / 1e6}%.1f}}""")
      spark.stop()

    case other =>
      System.err.println(s"usage: gen <turnsDir> <nTurns> | run <turnsDir> <workDir> [burnMs]; got: $other")
      sys.exit(2)
  }
}

package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.LakeTable

/** The §7 lake shim: snapshot-committed parquet tables with Iceberg's write
  * API shape — append/overwrite commits, time travel, crash-orphan
  * invisibility, and expire-based reclamation. */
class LakeTableSpec extends SparkSpecBase {
  import spark.implicits._

  test("append commits numbered snapshots; read sees exactly the committed rows") {
    val dir = Files.createTempDirectory("graft-lake").toString
    val v1 = LakeTable.append(spark, dir, spark.range(0, 100).toDF("id"))
    val v2 = LakeTable.append(spark, dir, spark.range(100, 250).toDF("id"))
    assert((v1, v2) == (1L, 2L))
    assert(LakeTable.read(spark, dir).count() == 250)
    assert(LakeTable.read(spark, dir).agg(sum("id")).head.getLong(0) == (0L until 250L).sum)
    assert(LakeTable.snapshot(spark, dir).get.rows == 250)
  }

  test("orphan manifest from a crashed commit: invisible, expire-safe, healed") {
    val dir = Files.createTempDirectory("graft-lake-orphan").toString
    LakeTable.append(spark, dir, spark.range(0, 50).toDF("id"))
    // simulate a crash between manifest write and the CURRENT swap: the
    // v2 manifest exists (pointing at no staged files) but CURRENT stays 1
    val orphan = java.nio.file.Paths.get(s"$dir/_snapshots/v00000002.json")
    java.nio.file.Files.writeString(orphan,
      """{"snapshot": 2, "rows": 0, "schema": "", "manifest_entries": []}""")
    // committedness is CURRENT, not manifest existence
    assert(LakeTable.snapshots(spark, dir) == Seq(1L))
    intercept[IllegalArgumentException] {
      LakeTable.read(spark, dir, asOf = Some(2L))
    }
    assert(LakeTable.read(spark, dir).count() == 50)
    // expire must keep the COMMITTED snapshot, not the orphan
    LakeTable.expire(spark, dir, keepLast = 1)
    assert(LakeTable.read(spark, dir).count() == 50)
    // a FRESH manifest above CURRENT could be a concurrent commit mid-swap,
    // so a new commit refuses to replace it...
    intercept[IllegalArgumentException] {
      LakeTable.append(spark, dir, spark.range(50, 80).toDF("id"))
    }
    // ...but once it is older than the grace window it is a crashed
    // commit's orphan, and the next commit heals it in place
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    assert(LakeTable.append(spark, dir, spark.range(50, 80).toDF("id")) == 2L)
    assert(LakeTable.read(spark, dir).count() == 80)
    assert(LakeTable.snapshots(spark, dir) == Seq(1L, 2L))
  }

  test("time travel reads any older snapshot unchanged after later commits") {
    val dir = Files.createTempDirectory("graft-lake-tt").toString
    LakeTable.append(spark, dir, spark.range(0, 10).toDF("id"))
    LakeTable.append(spark, dir, spark.range(10, 30).toDF("id"))
    LakeTable.overwrite(spark, dir, spark.range(500, 503).toDF("id"))
    assert(LakeTable.snapshots(spark, dir) == Seq(1L, 2L, 3L))
    assert(LakeTable.read(spark, dir, asOf = Some(1L)).as[Long].collect().sorted.toSeq ==
      (0L until 10L))
    assert(LakeTable.read(spark, dir, asOf = Some(2L)).count() == 30)
    assert(LakeTable.read(spark, dir).as[Long].collect().sorted.toSeq ==
      Seq(500L, 501L, 502L))
  }

  test("a crash between data-file write and commit is invisible to readers") {
    val dir = Files.createTempDirectory("graft-lake-crash").toString
    LakeTable.append(spark, dir, spark.range(0, 50).toDF("id"))
    // a dead writer's staged files: data landed, no manifest, no swap
    spark.range(1000, 2000).toDF("id").write.parquet(s"$dir/data/deadbeef")
    assert(LakeTable.read(spark, dir).count() == 50)
    assert(LakeTable.snapshots(spark, dir) == Seq(1L))
    // the next commit doesn't adopt the orphans either
    LakeTable.append(spark, dir, spark.range(50, 60).toDF("id"))
    assert(LakeTable.read(spark, dir).count() == 60)
    // expire reclaims them
    LakeTable.expire(spark, dir, keepLast = 1)
    assert(!new java.io.File(s"$dir/data/deadbeef").exists())
    assert(LakeTable.read(spark, dir).count() == 60)
  }

  test("expire keeps the newest snapshots readable and reclaims the rest") {
    val dir = Files.createTempDirectory("graft-lake-exp").toString
    LakeTable.append(spark, dir, spark.range(0, 5).toDF("id"))
    LakeTable.overwrite(spark, dir, spark.range(5, 9).toDF("id"))
    LakeTable.append(spark, dir, spark.range(9, 12).toDF("id"))
    LakeTable.expire(spark, dir, keepLast = 2)
    assert(LakeTable.snapshots(spark, dir) == Seq(2L, 3L))
    // v1's files served no retained snapshot — gone; v2/v3 still read
    assert(LakeTable.read(spark, dir, asOf = Some(2L)).count() == 4)
    assert(LakeTable.read(spark, dir).count() == 7)
    intercept[IllegalArgumentException] {
      LakeTable.read(spark, dir, asOf = Some(1L))
    }
  }

  test("append refuses schema drift; overwrite may change the schema") {
    val dir = Files.createTempDirectory("graft-lake-drift").toString
    LakeTable.append(spark, dir, spark.range(0, 5).toDF("id"))
    intercept[IllegalArgumentException] {
      LakeTable.append(spark, dir, spark.range(0, 5).select(col("id").cast("int").as("id")))
    }
    // refused before anything staged — the table is untouched
    assert(LakeTable.read(spark, dir).count() == 5)
    val v = LakeTable.overwrite(spark, dir,
      Seq(("x", 1)).toDF("name", "n"))
    assert(LakeTable.read(spark, dir).columns.toSeq == Seq("name", "n") && v == 2L)
  }

  test("compact bin-packs the small-file tail into a content-identical snapshot") {
    val dir = Files.createTempDirectory("graft-lake-compact").toString
    // four micro-batch-ish appends, 3 files each: the streaming sprawl shape
    (0 until 4).foreach(i => LakeTable.append(spark, dir,
      spark.range(i * 25L, (i + 1) * 25L).toDF("id").repartition(3)))
    assert(LakeTable.snapshot(spark, dir).get.files.size == 12)
    // nothing qualifies below 1 byte — no-op, no new snapshot
    assert(LakeTable.compact(spark, dir, smallBytes = 1L) == 4L)
    val cid = LakeTable.compact(spark, dir, targetBytes = 64L << 20, smallBytes = 1L << 20)
    assert(cid == 5L)
    val after = LakeTable.snapshot(spark, dir).get
    assert(after.files.size == 1 && after.rows == 100)
    assert(LakeTable.read(spark, dir).as[Long].collect().sorted.toSeq == (0L until 100L))
    // the pre-compaction snapshot still time-travels to the same content
    assert(LakeTable.read(spark, dir, asOf = Some(4L)).as[Long].collect().sorted.toSeq ==
      (0L until 100L))
    // replaced files live until expire reclaims the old snapshots
    LakeTable.expire(spark, dir, keepLast = 1)
    assert(LakeTable.read(spark, dir).as[Long].collect().sorted.toSeq == (0L until 100L))
    intercept[IllegalArgumentException] { LakeTable.read(spark, dir, asOf = Some(4L)) }
    // one big file left: compacting again is a no-op at the same snapshot
    assert(LakeTable.compact(spark, dir, smallBytes = 1L << 20) == 5L)
  }

  test("schema round-trips through the manifest; empty commits read back typed") {
    val dir = Files.createTempDirectory("graft-lake-schema").toString
    val df = Seq((1L, "a \"quoted\" name", 1.5)).toDF("id", "s", "x")
    LakeTable.append(spark, dir, df)
    // file sources read as nullable in Spark; the manifest stores that form
    assert(LakeTable.read(spark, dir).schema ==
      org.apache.spark.sql.types.StructType(df.schema.fields.map(_.copy(nullable = true))))
    val df2 = LakeTable.read(spark, dir)
    assert(df2.select("s").as[String].head() == "a \"quoted\" name")
    LakeTable.overwrite(spark, dir, df.filter(lit(false)))
    val empty = LakeTable.read(spark, dir)
    assert(empty.schema == df2.schema && empty.count() == 0)
  }
}

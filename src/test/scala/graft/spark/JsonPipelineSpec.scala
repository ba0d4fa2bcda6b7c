package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.JsonPipeline

/** clp_s slice: schema discovery + per-schema columnar routing + KQL with
  * wildcard paths resolved against the discovered schemas. */
class JsonPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val outDir = Files.createTempDirectory("graft-jsonl").toString
  private lazy val jsonl = Seq(
    """{"id":0,"msg":"hello big world","k":7}""",
    """{"id":1,"msg":"more text here","k":9}""",
    """{"id":2,"msg":"nested one","k":1,"meta":{"lang":"en","score":1.5}}""",
    """{"id":3,"msg":"nested two","k":99,"meta":{"lang":"fr","score":2.5}}""",
    """{"id":4,"msg":"arrays now","tags":["a","b"]}""",
    """{"id":5,"msg":"bool row","ok":true}"""
  ).toDF("json")
  private lazy val result = JsonPipeline.route(spark, jsonl, "json", outDir)

  test("route discovers one schema per record shape and counts records") {
    assert(result.nRecords == 6 && result.nSchemas == 4)
    val schemas = spark.read.parquet(s"$outDir/schemas").collect()
    assert(schemas.map(_.getAs[Long]("n_records")).sum == 6)
    val byDesc = schemas.map(r => r.getAs[String]("descriptor") -> r.getAs[Long]("n_records")).toMap
    assert(byDesc("id:Integer;k:Integer;msg:ClpString") == 2)
    assert(byDesc("id:Integer;k:Integer;meta.lang:VarString;meta.score:Float;msg:ClpString") == 2)
  }

  test("schema tree holds the merged typed leaf set with dense node ids") {
    result // force
    val tree = spark.read.parquet(s"$outDir/schema_tree").orderBy("node_id").collect()
    assert(tree.map(_.getInt(0)).toSeq == tree.indices)
    val leaves = tree.map(r => (r.getString(1), r.getString(2))).toSet
    assert(leaves.contains(("meta.lang", "VarString")))
    assert(leaves.contains(("meta.score", "Float")))
    assert(leaves.contains(("tags", "UnstructuredArray")))
    assert(leaves.contains(("ok", "Boolean")))
  }

  test("per-schema tables are typed columnar parquet with same-shape rows together") {
    result // force
    val nested = JsonPipeline.schemasWithPath(spark, outDir, "meta.lang")
    assert(nested.size == 1)
    val tbl = JsonPipeline.table(spark, outDir, nested.head)
    assert(tbl.count() == 2)
    assert(tbl.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(tbl.select("meta.lang").as[String].collect().toSet == Set("en", "fr"))
  }

  test("KQL wildcard path binds to the discovered nested column across schemas") {
    result // force
    val hits = JsonPipeline.kqlSearch(spark, outDir, "*.lang : en", Seq("id"))
      .as[Long].collect().toSet
    assert(hits == Set(2L))
    // schemas without the path contribute nothing; range filter over typed col
    val hits2 = JsonPipeline.kqlSearch(spark, outDir, "meta.score >= 2 OR k : 7", Seq("id"))
      .as[Long].collect().toSet
    assert(hits2 == Set(0L, 3L))
  }
}

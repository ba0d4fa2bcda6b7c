package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.JsonShape

/**
 * The clp_s structured-JSON pipeline slice (SURVEY §1.2 / §2.1 S4+S7):
 * heterogeneous JSONL records are shape-discovered per record
 * ([[JsonShape]]), deduplicated into a schema catalog + merged leaf tree
 * (the MPT re-expressed as data), and routed into per-schema columnar
 * tables — records with the same schema stored together, each table typed
 * by its own inferred Spark schema
 * (components/core/src/clp_s/JsonParser.cpp, SchemaMap/ArchiveWriter,
 * ColumnWriter.hpp:50-173).
 *
 * Archive layout under `outDir`:
 *   schemas/       (schema_id, descriptor, n_records)       — SchemaMap
 *   schema_tree/   (node_id, path, node_type)               — MPT leaves
 *   tables/schema=<id>/  per-schema columnar parquet         — SchemaWriter
 *
 * Scale notes: shape discovery and routing are single-pass per-row ops; the
 * only driver-side structure is the schema catalog itself, which the
 * reference also keeps memory-resident (SchemaMap) — real-world schema
 * counts are 10²-10⁴, never row-scale. The per-schema write partitions by
 * schema_id in ONE shuffle-free pass per schema group; records inside a
 * schema stay in input order (log_event_idx ordering invariant).
 */
object JsonPipeline {

  private val descriptorUdf = udf((s: String) => JsonShape.descriptor(s))

  /** Adds `descriptor` and `schema_id` columns derived from `jsonCol`. */
  def withSchemaId(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("descriptor", descriptorUdf(col(jsonCol)))
      .withColumn("schema_id", md5(col("descriptor")))

  final case class Result(nRecords: Long, nSchemas: Long)

  /**
   * Full route: discover shapes, write the schema catalog + merged leaf
   * tree, then one typed columnar table per discovered schema.
   *
   * @param metadata extra per-record metadata columns stored alongside the
   *        raw records and exposed to [[kqlSearch]] — the clp_s range-index
   *        idea (`$_filename`, `$_file_split_number`,
   *        `$_archive_creator_id`; RangeIndexWriter.hpp:17-38,
   *        archive_constants.hpp:41-45)
   */
  def route(spark: SparkSession, jsonl: DataFrame, jsonCol: String, outDir: String,
            metadata: Seq[(String, org.apache.spark.sql.Column)] = Nil): Result = {
    import spark.implicits._
    // ONE pass over the input discovers shapes and lands the raw records
    // partitioned by schema_id (the clp_s record store, original order kept
    // within a schema); everything downstream — catalog, tree, per-schema
    // parses — reads ONLY its own partition via directory pruning instead
    // of re-scanning the input once per schema.
    withSchemaId(jsonl, jsonCol)
      .withColumn("_raw", col(jsonCol))
      .select(Seq(col("schema_id"), col("descriptor"), col("_raw")) ++
        metadata.map { case (n, c) => c.as(n) }: _*)
      .write.partitionBy("schema_id").mode("overwrite").parquet(s"$outDir/records")
    val shaped = spark.read.parquet(s"$outDir/records")

    // SchemaMap: schema_id ↔ descriptor (+ counts), deduped
    val schemas = shaped.groupBy("schema_id", "descriptor")
      .agg(count(lit(1)).as("n_records"))
    schemas.write.mode("overwrite").parquet(s"$outDir/schemas")

    // MPT leaves: union of every schema's leaf set; deterministic dense node
    // ids by (path, type) sort — the distributed twin of sequential node
    // insertion (SchemaTree.hpp:32-47)
    val tree = spark.read.parquet(s"$outDir/schemas")
      .select(explode(split(col("descriptor"), ";")).as("leaf"))
      .distinct()
      .select(
        substring_index(col("leaf"), ":", 1).as("path"),
        substring_index(col("leaf"), ":", -1).as("node_type"))
      .orderBy("path", "node_type")
      .withColumn("node_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("path", "node_type")) - 1)
    tree.select("node_id", "path", "node_type")
      .write.mode("overwrite").parquet(s"$outDir/schema_tree")

    // per-schema columnar tables: each schema group parsed with its OWN
    // inferred schema (the reference's per-schema ColumnWriters); the schema
    // catalog is driver-resident exactly like the reference's SchemaMap
    val ids = spark.read.parquet(s"$outDir/schemas")
      .select("schema_id").collect().map(_.getString(0))
    val tableSchemas = ids.map { id =>
      val sub = shaped.filter(col("schema_id") === id) // partition-pruned read
        .select(col("_raw")).as[String]
      val tbl = spark.read.json(sub)
      tbl.write.mode("overwrite").parquet(s"$outDir/tables/schema=$id")
      id -> tbl.schema.json
    }
    // catalog the inferred Spark schema per schema_id so search can re-parse
    // records (aligned with their metadata columns) without re-inference
    tableSchemas.toSeq.toDF("schema_id", "spark_schema")
      .write.mode("overwrite").parquet(s"$outDir/table_schemas")
    Result(shaped.count(), ids.length.toLong)
  }

  /** Reads one schema's columnar table. */
  def table(spark: SparkSession, outDir: String, schemaId: String): DataFrame =
    spark.read.parquet(s"$outDir/tables/schema=$schemaId")

  /** Schema ids whose descriptor contains a leaf path matching `pathGlob`
    * (wildcard per segment) — SchemaMatch.cpp column-descriptor resolution
    * against the discovered tree (Q9). */
  def schemasWithPath(spark: SparkSession, outDir: String, pathGlob: String): Seq[String] = {
    val pat = graft.core.Wildcard.cleanUp(pathGlob)
    spark.read.parquet(s"$outDir/schemas").select("schema_id", "descriptor").collect()
      .filter(_.getString(1).split(";").exists { leaf =>
        val path = leaf.substring(0, leaf.lastIndexOf(':'))
        graft.core.Wildcard.matches(path, pat, caseSensitive = true)
      })
      .map(_.getString(0)).toSeq.sorted
  }

  /**
   * KQL search across every discovered schema — the clp_s schema-pruned
   * search: each schema's records re-parse through the cataloged Spark
   * schema (partition-pruned read, no re-inference) with the archive's
   * range-index metadata columns alongside, and the per-schema predicate
   * runs over the typed columns (search/SchemaMatch.cpp + Output.cpp:35-131,
   * QueryRunner). Filters whose columns a schema lacks fold to false for
   * that schema — negated ones included (SchemaMatch existence rule, see
   * [[graft.search.KqlCompiler]]). Results are the union over matched
   * schemas, restricted to `select` columns present in each.
   */
  def kqlSearch(spark: SparkSession, outDir: String, kql: String,
                selectCols: Seq[String]): DataFrame = {
    val ast = graft.search.Kql.parse(kql) match {
      case Right(a) => a
      case Left(err) => throw new IllegalArgumentException(s"KQL parse error: $err")
    }
    val records = spark.read.parquet(s"$outDir/records")
    val metaCols = records.columns.filter(_.startsWith("$")).toSeq
    val tblSchemas = spark.read.parquet(s"$outDir/table_schemas")
      .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    val parts = tblSchemas.toSeq.flatMap { case (id, schemaJson) =>
      val recSchema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val df = records.filter(col("schema_id") === id) // partition-pruned
        .withColumn("_rec", from_json(col("_raw"), recSchema))
        .select(metaCols.map(m => col(s"`$m`")) :+ col("_rec.*"): _*)
      val hasAll = selectCols.forall(c => df.columns.contains(c))
      if (!hasAll) None
      else Some(df.filter(graft.search.KqlCompiler.compile(ast, df.schema))
        .select(selectCols.map(col): _*))
    }
    parts.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
  }
}

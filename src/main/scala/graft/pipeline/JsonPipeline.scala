package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{JsonShape, TimestampPatterns}
import graft.search.KqlCompiler.quoteName

/**
 * The clp_s structured-JSON pipeline slice (SURVEY §1.2 / §2.1 S4+S7):
 * heterogeneous JSONL records are shape-discovered per record
 * ([[JsonShape]]), deduplicated into a schema catalog + merged leaf tree
 * (the MPT re-expressed as data), and routed into per-schema partitions —
 * records with the same schema stored together, each schema's typed Spark
 * StructType DERIVED from its descriptor + element shapes, never inferred
 * by a data pass (components/core/src/clp_s/JsonParser.cpp,
 * SchemaMap/ArchiveWriter, ColumnWriter.hpp:50-173).
 *
 * Archive layout under `outDir`:
 *   records/schema_id=<id>/  raw records + log_event_idx + $_ts + metadata
 *   schemas/       (schema_id, descriptor, n_records, min_ts, max_ts)
 *   schema_tree/   (node_id, path, node_type)                — MPT leaves
 *   table_schemas/ (schema_id, spark_schema)      — derived StructType json
 *
 * First-class timestamps (the reference's `--timestamp-key`,
 * CommandLineArguments.cpp:233-235): the designated leaf is typed
 * `DateString` (JsonParser.cpp:558-574), its parsed epoch lands in the
 * `$_ts` metadata column, and per-schema min/max epoch in the catalog is
 * the range index (TimestampEntry.hpp:30-51) consulted at plan time by
 * [[kqlSearch]] — an out-of-range query touches zero partitions
 * (search/EvaluateTimestampIndex.cpp), and in-range queries get the
 * tge/tle predicate injected (search/AddTimestampConditions.hpp:15-34).
 *
 * Scale notes: route is a FIXED number of Spark jobs regardless of schema
 * count — one shaping pass that lands the records store (shuffled once on
 * schema_id so each schema gets contiguous files), one catalog aggregation,
 * and driver-side writes of the catalog/tree/table-schema tables. The only
 * driver-side structure is the schema catalog itself, which the reference
 * also keeps memory-resident (SchemaMap) — real-world schema counts are
 * 10²-10⁴, never row-scale. Round 2's per-schema `spark.read.json`
 * inference loop (10⁴ sequential jobs at reference-realistic schema counts)
 * is gone: element types for array columns are canonicalized into mergeable
 * shape strings at parse time ([[JsonShape.shapeOf]]) and merged in the
 * catalog aggregation, exactly the information the reference's MPT child
 * nodes carry.
 */
object JsonPipeline {

  /** Ingest options — the clp_s command-line surface re-expressed
    * (CommandLineArguments.cpp: `--timestamp-key`, `--structurize-arrays`).
    *
    * @param timestampKey dotted path of the timestamp column
    * @param structurizeArrays type arrays as StructuredArray with element
    *        child nodes (finer-grained schema identity, like the reference)
    * @param orderCol existing total-order column to use as log_event_idx
    *        (archive_constants.hpp:31); None ⇒ a deterministic zipWithIndex
    *        pass assigns contiguous input-order indices
    * @param filesPerSchema fan-out within one schema's partition — bound on
    *        file count for hot schemas (the ClpPipeline route twin)
    */
  final case class Options(
      timestampKey: Option[String] = None,
      structurizeArrays: Boolean = false,
      /** The clp_s `--retain-float-format` mode (JsonParser.cpp:255-283):
        * float leaves type as `FormattedFloat` (compact (double, word)
        * encoding, byte-exact restore) when [[graft.core.FloatFormat]] can
        * reproduce the literal, else `DictionaryFloat` — the node type (and
        * so the schema identity) changes exactly like the reference's MPT
        * does under the flag. Off ⇒ plain `Float` (the clp_s default). */
      retainFloatFormat: Boolean = false,
      /** The clp_s `--max-document-size` ingest guard
        * (JsonFileIterator.cpp:77-81, default 512 MiB): a single record
        * larger than this many UTF-8 bytes refuses loudly instead of
        * ballooning executor memory — the reference errors the parse the
        * same way when its document buffer would exceed the cap. */
      maxDocumentSize: Long = 512L * 1024 * 1024,
      orderCol: Option[String] = None,
      filesPerSchema: Int = 1,
      /** Parquet writer options for the archive outputs — same knob as
        * [[ClpPipeline.Config.parquetOptions]] (archival profile: zstd +
        * level 9 + v2 delta pages; see BENCH/BASELINE.md measurements). */
      parquetOptions: Map[String, String] = Map.empty,
      /** Store a shredded VARIANT twin (`_var`) of every record alongside
        * `_raw` — the reference's per-column typed streams
        * (clp_s/ColumnWriter.hpp:50-173) re-expressed as Spark 4 parquet
        * variant shredding: each schema's homogeneous records shred into
        * real typed subcolumns, so [[kqlSearch]] reads ONLY the queried
        * leaves from disk (ReadSchema prunes to the shredded fields, filters
        * push into the scan) instead of scanning + parsing the full `_raw`
        * string of every candidate record. `_raw` stays authoritative for
        * byte-exact [[extract]]. Divergence note: duplicate keys within one
        * object resolve last-wins in the variant (same as the from_json
        * query path). */
      shredRecords: Boolean = false)

  /** Numeric timestamp-key values are epoch seconds unless already epoch
    * millis (≥10^12); strings go through the reference's timestamp pattern
    * corpus. Unparseable ⇒ null (the record stays, its schema range just
    * doesn't tighten). */
  private def parseTs(nodeType: String, value: String): Option[Long] = nodeType match {
    case "DateString" => TimestampPatterns.searchFull(value).map(_.epochMs)
    case "Integer" =>
      value.toLongOption.map(v => if (math.abs(v) >= 1000000000000L) v else v * 1000L)
    case "Float" | "FormattedFloat" | "DictionaryFloat" =>
      // the same millis-vs-seconds heuristic as Integer — a float epoch-ms
      // value multiplied again would land the range index off by 1000x
      value.toDoubleOption.map(v =>
        if (math.abs(v) >= 1.0e12) v.toLong else (v * 1000.0).toLong)
    case _ => None
  }

  /** (descriptor, epoch-millis-or-null, array-shape entries) per record —
    * a flat tuple return so Catalyst's encoder codegen stays happy. */
  private def shapeUdf(timestampKey: Option[String], structurizeArrays: Boolean,
                       retainFloatFormat: Boolean = false,
                       maxDocumentSize: Long = Long.MaxValue) =
    udf { (json: String) =>
      // cheap char-count fast path; exact UTF-8 length only near the cap
      if (json.length.toLong * 3 > maxDocumentSize &&
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong >
            maxDocumentSize)
        throw JsonShape.ParseError(
          s"document exceeds max-document-size ($maxDocumentSize B)", 0)
      val ls = JsonShape.typedLeaves(json, retainFloatFormat,
        timestampKey, structurizeArrays)
      val descriptor = ls.map(l => s"${l.path}:${l.nodeType}").distinct.sorted.mkString(";")
      val ts: java.lang.Long = timestampKey.flatMap(k =>
        ls.find(_.path == k).flatMap(l => parseTs(l.nodeType, l.value)))
        .map(java.lang.Long.valueOf).orNull
      // the archive stores keyed columns: a root that is not a non-empty
      // object has no column name to live under and would be silently
      // unqueryable (the reference wraps such roots under an unnamed root
      // node, JsonParser.cpp:437-470 — documented divergence: we refuse).
      // '$'-prefixed and log_event_idx top-level keys collide with the
      // archive's own metadata columns in every search frame — reserved.
      if (ls.headOption.exists(_.path.isEmpty))
        throw JsonShape.ParseError("root must be a non-empty JSON object", 0)
      ls.foreach { l =>
        val head = l.path.takeWhile(_ != '.')
        if (head.startsWith("$") || head == "log_event_idx")
          throw JsonShape.ParseError(s"reserved top-level key '$head'", 0)
      }
      val shapes = ls.iterator
        .filter(l => l.nodeType == "UnstructuredArray" || l.nodeType == "StructuredArray")
        // structurize child leaves ([] path segments) are value-less type
        // markers — a nested array among them would feed shapeOf("") and
        // crash; the array node itself already carries the full raw text,
        // so its shape covers every nested element
        .filterNot(_.path.contains("[]"))
        .map(l => s"${l.path}=${JsonShape.shapeOf(l.value)}")
        .mkString("\u0001")
      (descriptor, ts, shapes)
    }

  /** Adds `descriptor` and `schema_id` columns derived from `jsonCol`. */
  def withSchemaId(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("descriptor",
        shapeUdf(None, structurizeArrays = false)(col(jsonCol)).getField("_1"))
      .withColumn("schema_id", md5(col("descriptor")))

  final case class Result(nRecords: Long, nSchemas: Long)

  // ---- descriptor + shapes → Spark StructType (no inference pass) --------

  private def scalarDataType(nodeType: String): DataType = nodeType match {
    case "Integer" => LongType
    case "Float" | "FormattedFloat" | "DictionaryFloat" => DoubleType
    case "Boolean" => BooleanType
    // null-only and string-family leaves land as strings (what inference
    // would pick); DateString stays the raw string — $_ts carries the epoch
    case "NullValue" | "ClpString" | "VarString" | "DateString" => StringType
    case "Object" => StructType(Nil)
    case other => throw new IllegalArgumentException(s"not a scalar node type: $other")
  }

  private[pipeline] def shapeToDataType(shape: String): DataType = shape match {
    case "L" => LongType
    case "D" => DoubleType
    case "B" => BooleanType
    case "S" | "N" | "E" => StringType
    // irreconcilable element mix: fall back to the raw JSON text (Spark's
    // Jackson parser captures any value as its text for StringType fields)
    case "X" => StringType
    case s if s.startsWith("[") => ArrayType(shapeToDataType(s.substring(1, s.length - 1)))
    case s if s.startsWith("{") =>
      StructType(JsonShape.shapeFields(s).toSeq.sortBy(_._1).map { case (k, sub) =>
        StructField(k, shapeToDataType(sub))
      })
    case other => throw new IllegalArgumentException(s"bad shape: $other")
  }

  /** Derives the per-schema Spark StructType from the canonical descriptor
    * plus the merged array-element shapes — the reference reads exactly this
    * off its MPT nodes; no data pass. */
  private[pipeline] def deriveStructType(
      descriptor: String, arrShapes: Map[String, String]): StructType = {
    val ls = descriptor.split(';').iterator.filter(_.nonEmpty)
      .map { leaf =>
        val c = leaf.lastIndexOf(':')
        (leaf.substring(0, c), leaf.substring(c + 1))
      }
      // structurize child leaves carry element typing, already merged into
      // the shape entries of their array node
      .filterNot(_._1.contains("[]"))
      .toSeq
    def build(entries: Seq[(List[String], String, String)]): StructType = {
      val groups = entries.groupBy(_._1.head).toSeq.sortBy(_._1)
      StructType(groups.map { case (seg, sub) =>
        val (leavesHere, deeper) = sub.partition(_._1.length == 1)
        if (deeper.isEmpty) {
          val (_, t, full) = leavesHere.head
          val dt =
            if (t == "UnstructuredArray" || t == "StructuredArray")
              arrShapes.get(full).map(shapeToDataType).getOrElse(StringType)
            else scalarDataType(t)
          // the timestamp-key marker survives into the search frame: a
          // numeric KQL compare on a DateString leaf evaluates the row's
          // encoded epoch, not the raw string (QueryRunner.cpp
          // evaluate_epoch_date_filter — see KqlCompiler.leafPredicate)
          val md =
            if (t == "DateString")
              new MetadataBuilder().putBoolean("graftDateEpoch", true).build()
            else Metadata.empty
          StructField(seg, dt, nullable = true, metadata = md)
        } else
          // a path is never both leaf and prefix within one record's shape
          StructField(seg, build(deeper.map { case (p, t, f) => (p.tail, t, f) }))
      })
    }
    build(ls.map { case (p, t) => (p.split('.').toList, t, p) })
  }

  /**
   * Full route: discover shapes, land the per-schema records store, write
   * the schema catalog (+ timestamp range index) + merged leaf tree +
   * derived per-schema Spark schemas. O(1) Spark jobs at any schema count.
   *
   * @param metadata extra per-record metadata columns stored alongside the
   *        raw records and exposed to [[kqlSearch]] — the clp_s range-index
   *        idea (`$_filename`, `$_file_split_number`,
   *        `$_archive_creator_id`; RangeIndexWriter.hpp:17-38,
   *        archive_constants.hpp:41-45)
   */
  def route(spark: SparkSession, jsonl: DataFrame, jsonCol: String, outDir: String,
            metadata: Seq[(String, Column)] = Nil,
            options: Options = Options()): Result = {
    // log_event_idx: the reference's per-record sequential index
    // (archive_constants.hpp:31). An existing total-order column is the
    // zero-cost path; otherwise zipWithIndex assigns contiguous input-order
    // ids (one extra count job — still O(1) jobs).
    val indexed = options.orderCol match {
      case Some(c) => jsonl.withColumn("log_event_idx", col(c).cast(LongType))
      case None =>
        val base = jsonl
        val rdd = base.rdd.zipWithIndex.map { case (r, ix) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ ix)
        }
        spark.createDataFrame(rdd, base.schema.add("log_event_idx", LongType))
    }

    // ONE shaping pass lands the records store partitioned by schema_id —
    // shuffled once on (schema_id, bounded salt) so every schema gets
    // contiguous, boundedly-many files, ordered by log_event_idx within
    val shaped0 = indexed
      .withColumn("_shape", shapeUdf(options.timestampKey, options.structurizeArrays,
        options.retainFloatFormat, options.maxDocumentSize)(col(jsonCol)))
      .select(Seq(
        md5(col("_shape._1")).as("schema_id"),
        col("_shape._1").as("descriptor"),
        col("_shape._2").as("$_ts"),
        col("_shape._3").as("_arr_shapes"),
        col("log_event_idx"),
        col(jsonCol).as("_raw")) ++
        (if (options.shredRecords) Seq(parse_json(col(jsonCol)).as("_var")) else Nil) ++
        metadata.map { case (nm, c) => c.as(nm) }: _*)
    // variant shredding is session-conf-driven (no per-write option): each
    // per-schema file infers its own shredding schema — homogeneous by
    // construction, so every leaf lands in a typed subcolumn. Confs are
    // restored after the write (they also govern parse_json evaluation,
    // which runs inside this job).
    val shredConfs = Seq(
      "spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema",
      "spark.sql.variant.allowDuplicateKeys")
    val prevShred = shredConfs.map(k => k -> spark.conf.getOption(k))
    if (options.shredRecords) shredConfs.foreach(spark.conf.set(_, "true"))
    try {
      shaped0
        .repartition(col("schema_id"),
          pmod(xxhash64(col("log_event_idx")), lit(options.filesPerSchema.max(1))))
        .sortWithinPartitions("schema_id", "log_event_idx")
        .write.options(options.parquetOptions).partitionBy("schema_id").mode("overwrite").parquet(s"$outDir/records")
    } finally if (options.shredRecords) prevShred.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // read back with the KNOWN schema: an empty corpus writes no part files,
    // and schema inference over zero files would crash; everything downstream
    // then flows through to an empty (but valid) archive
    val shaped = spark.read.schema(shaped0.schema).parquet(s"$outDir/records")

    // ONE aggregation builds the whole catalog: SchemaMap counts, the
    // TimestampEntry min/max range index, and the merged element shapes
    import spark.implicits._
    val catalog = shaped
      .groupBy("schema_id", "descriptor")
      .agg(
        count(lit(1)).as("n_records"),
        min(col("`$_ts`")).as("min_ts"),
        max(col("`$_ts`")).as("max_ts"),
        collect_set(col("_arr_shapes")).as("shape_sets"))
      .as[(String, String, Long, Option[Long], Option[Long], Seq[String])]
      .collect()
      .sortBy(_._1)

    catalog.toSeq.map(c => (c._1, c._2, c._3, c._4, c._5))
      .toDF("schema_id", "descriptor", "n_records", "min_ts", "max_ts")
      .coalesce(1).write.options(options.parquetOptions).mode("overwrite").parquet(s"$outDir/schemas")

    // Range index (RangeIndexWriter.hpp:17-38): one [s,e) log_event_idx span
    // per distinct metadata tuple — the per-ingest-file metadata the
    // reference records at compression time. Entry count is ingest-source
    // scale (catalog-like), never row scale; values stored as strings, the
    // typed row columns stay alongside the records for exact filtering.
    val rangeCols = shaped.columns.filter(c => c.startsWith("$") && c != "$_ts").toSeq
    if (rangeCols.nonEmpty) {
      val entries = shaped
        .groupBy(rangeCols.map(c => col(quoteName(c))): _*)
        .agg(min(col("log_event_idx")).as("_s"), max(col("log_event_idx")).as("_e"))
        .collect()
        .map { r =>
          val fields = rangeCols.flatMap(c =>
            Option(r.getAs[Any](c)).map(v => (c, v.toString))).toMap
          (r.getAs[Long]("_s"), r.getAs[Long]("_e") + 1L, fields)
        }
        .sortBy(_._1).toSeq
      entries.toDF("start_idx", "end_idx", "fields")
        .coalesce(1).write.options(options.parquetOptions).mode("overwrite").parquet(s"$outDir/range_index")
    } else {
      // a metadata-free re-route over a dir that HAD metadata must not leave
      // the previous ingest's index describing the overwritten records —
      // through the Hadoop FS, same as kqlSearch's existence check (a
      // java.io.File would miss s3a:// and file:/ outDirs entirely)
      val riPath = new org.apache.hadoop.fs.Path(s"$outDir/range_index")
      val fs = riPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(riPath)) fs.delete(riPath, true)
    }

    // MPT leaves: union of every schema's leaf set; deterministic dense node
    // ids by (path, type) sort — the distributed twin of sequential node
    // insertion (SchemaTree.hpp:32-47)
    val tree = catalog.iterator.flatMap(_._2.split(';')).filter(_.nonEmpty).toSeq.distinct
      .map { leaf =>
        val c = leaf.lastIndexOf(':')
        (leaf.substring(0, c), leaf.substring(c + 1))
      }
      .sorted.zipWithIndex
      .map { case ((p, t), ix) => (ix, p, t) }
    tree.toDF("node_id", "path", "node_type")
      .coalesce(1).write.options(options.parquetOptions).mode("overwrite").parquet(s"$outDir/schema_tree")

    // derived per-schema Spark schema (so search re-parses records without
    // inference); merged across records via the shape-widening rules
    val tableSchemas = catalog.toSeq.map { case (id, descriptor, _, _, _, shapeSets) =>
      val merged = shapeSets.iterator.filter(_.nonEmpty)
        .flatMap(_.split('\u0001'))
        .map { e => val eq = e.indexOf('='); (e.substring(0, eq), e.substring(eq + 1)) }
        .foldLeft(Map.empty[String, String]) { case (m, (p, s)) =>
          m.updated(p, m.get(p).map(JsonShape.mergeShape(_, s)).getOrElse(s))
        }
      (id, deriveStructType(descriptor, merged).json)
    }
    tableSchemas.toDF("schema_id", "spark_schema")
      .coalesce(1).write.options(options.parquetOptions).mode("overwrite").parquet(s"$outDir/table_schemas")

    Result(catalog.iterator.map(_._3).sum, catalog.length.toLong)
  }

  /** One schema's typed columnar view: the partition-pruned records parsed
    * through the derived StructType (no inference). */
  def table(spark: SparkSession, outDir: String, schemaId: String): DataFrame = {
    val schemaJson = spark.read.parquet(s"$outDir/table_schemas")
      .filter(col("schema_id") === schemaId)
      .select("spark_schema").collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"unknown schema $schemaId"))
      .getString(0)
    val recSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    spark.read.parquet(s"$outDir/records")
      .filter(col("schema_id") === schemaId)
      .withColumn("_rec", from_json(col("_raw"), recSchema))
      .select(col("_rec.*"))
  }

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

  /** True iff every field name in the schema (at any depth) is expressible
    * in both the variant path bracket syntax and unquoted-safe DDL — the
    * conservative gate for the shredded read path; anything else falls back
    * to from_json over `_raw` (same results, row-wise read). */
  private def variantSafe(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.forall(f =>
      !f.name.exists(c => c == '"' || c == '\\' || c == '`') && variantSafe(f.dataType))
    case a: ArrayType => variantSafe(a.elementType)
    case _ => true
  }

  private case class CatalogEntry(schemaId: String, descriptor: String,
                                  minTs: Option[Long], maxTs: Option[Long],
                                  sparkSchema: StructType)

  private def loadCatalog(spark: SparkSession, outDir: String): Seq[CatalogEntry] = {
    val schemaJsons = spark.read.parquet(s"$outDir/table_schemas")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    spark.read.parquet(s"$outDir/schemas")
      .select("schema_id", "descriptor", "min_ts", "max_ts").collect()
      .map { r =>
        CatalogEntry(r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          DataType.fromJson(schemaJsons(r.getString(0))).asInstanceOf[StructType])
      }
      .sortBy(_.schemaId).toSeq
  }

  /**
   * KQL search across every discovered schema — the clp_s schema-pruned
   * search: each schema's records re-parse through the DERIVED Spark schema
   * (partition-pruned read, no re-inference) with the archive's range-index
   * metadata columns alongside, and the per-schema predicate runs over the
   * typed columns (search/SchemaMatch.cpp + Output.cpp:35-131, QueryRunner).
   * Filters whose columns a schema lacks fold to false for that schema —
   * negated ones included (SchemaMatch existence rule, see
   * [[graft.search.KqlCompiler]]).
   *
   * Timestamp range (`tsLo`/`tsHi`, epoch millis, inclusive): evaluated
   * against the per-schema min/max range index BEFORE any read — schemas
   * that cannot match (disjoint range, or no timestamp at all) are pruned at
   * plan time (EvaluateTimestampIndex.cpp) — and injected as a `$_ts`
   * predicate on the survivors (AddTimestampConditions.hpp:15-34).
   *
   * `selectCols` are resolved per schema as wildcard column paths
   * (search/Projection.cpp): each pattern binds to every matching column of
   * each schema; schemas lacking a projected column contribute null for it
   * (never silently dropped); name-sharing columns with irreconcilable types
   * across schemas widen (numeric→double, else string).
   */
  def kqlSearch(spark: SparkSession, outDir: String, kql: String,
                selectCols: Seq[String],
                tsLo: Option[Long] = None, tsHi: Option[Long] = None): DataFrame = {
    val ast = graft.search.Kql.parse(kql) match {
      case Right(a) => a
      case Left(err) => throw new IllegalArgumentException(s"KQL parse error: $err")
    }
    val hasTsFilter = tsLo.isDefined || tsHi.isDefined

    val fullCatalog = loadCatalog(spark, outDir)
    // an EMPTY archive wrote no record part files — nothing to read a schema
    // from; answer the typed empty result directly
    if (fullCatalog.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(selectCols.filterNot(_.contains("*")).map(c => StructField(c, StringType))))
    val records = spark.read.parquet(s"$outDir/records")
    val metaCols = records.columns.filter(_.startsWith("$")).toSeq
    val metaFieldsOut = metaCols.map(records.schema(_))

    /** Output (name, type) columns resolved + widened across `entries` —
      * used both for the real union and for typing an empty result (so a
      * plan-time-pruned query still returns the archive's column types). */
    def outTypesFor(entries: Seq[CatalogEntry]): Seq[(String, DataType)] = {
      val outTypes = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      entries.foreach { e =>
        graft.search.KqlCompiler
          .resolveProjection(StructType(metaFieldsOut ++ e.sparkSchema.fields), selectCols)
          .foreach { case (nm, dt) =>
            outTypes.get(nm) match {
              case None => outTypes(nm) = dt
              case Some(prev) if prev == dt => ()
              case Some(prev) =>
                val bothNumeric = Seq(prev, dt).forall(t =>
                  t == LongType || t == DoubleType || t.isInstanceOf[DecimalType])
                outTypes(nm) = if (bothNumeric) DoubleType else StringType
            }
          }
      }
      outTypes.toSeq
    }

    def emptyResult: DataFrame = {
      val resolved = outTypesFor(fullCatalog)
      val fields =
        if (resolved.nonEmpty) resolved.map { case (nm, dt) => StructField(nm, dt) }
        else selectCols.filterNot(_.contains("*")).map(c => StructField(c, StringType))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields))
    }

    // plan-time timestamp-index pruning (EvaluateTimestampIndex) happens
    // BEFORE the records store is even opened — a fully-out-of-range query
    // (or a time-bounded query over an archive ingested without a timestamp
    // key, whose ranges are all null — AddTimestampConditions) compiles to
    // an empty local relation, no file scan at all
    val catalog = fullCatalog.filter { e =>
      !hasTsFilter ||
        (e.minTs.isDefined && e.maxTs.isDefined &&
          tsLo.forall(lo => e.maxTs.get >= lo) && tsHi.forall(hi => e.minTs.get <= hi))
    }
    if (catalog.isEmpty) return emptyResult
    if (hasTsFilter && !metaCols.contains("$_ts")) return emptyResult

    // range index, if the archive has one (metadata columns at ingest):
    // loaded driver-side (ingest-source scale) for plan-time `$`-filter
    // evaluation (EvaluateRangeIndexFilters.cpp)
    val riPath = new org.apache.hadoop.fs.Path(s"$outDir/range_index")
    val rangeIndex: Option[Seq[graft.search.RangeIndex.Entry]] =
      if (riPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(riPath))
        Some(spark.read.parquet(riPath.toString).collect().toSeq.map(r =>
          graft.search.RangeIndex.Entry(r.getAs[Long]("start_idx"),
            r.getAs[Long]("end_idx"), r.getAs[Map[String, String]]("fields"))))
      else None

    // Per-schema typed frames + predicate. SchemaMatch prunes FIRST: the
    // predicate is compiled against each schema's derived StructType (no
    // DataFrame built yet), and a schema whose predicate folds to a constant
    // non-true is dropped on the driver — the union stays O(matching
    // schemas), not O(catalog), in both plan size and analysis time (the
    // reference computes the matching schema set from the MPT before any
    // table is opened — search/SchemaMatch.cpp).
    val metaFields = metaCols.map(records.schema(_)) :+
      StructField("log_event_idx", LongType)
    val frames = catalog.flatMap { e =>
      val fullSchema = StructType(metaFields ++ e.sparkSchema.fields)
      val kqlPred = graft.search.KqlCompiler.compile(ast, fullSchema, rangeIndex)
      // short-circuit boolean fold BEFORE any plan is built: `$`-filters
      // matching no index entry, or paths absent from this schema, fold the
      // whole predicate to a non-true constant and the scan is never
      // compiled (the reference's EmptyExpr / SchemaMatch prune)
      val cantMatch = org.apache.spark.sql.GraftInternals.foldedValue(kqlPred)
        .exists(_ != true)
      if (cantMatch) None
      else {
        val pruned = records.filter(col("schema_id") === e.schemaId) // partition-pruned
        // Shredded archives read each top-level field straight from its
        // typed variant subcolumn: the scan's ReadSchema prunes to the
        // fields the query actually touches and predicates push into the
        // parquet scan — `_raw` is never read (the clp_s per-column streams,
        // ColumnWriter.hpp:50-173). try_variant_get mirrors PERMISSIVE
        // from_json: null on absent path or cast mismatch. Field names the
        // variant path / DDL syntax can't quote fall back to from_json.
        val df =
          if (records.columns.contains("_var") && variantSafe(e.sparkSchema))
            pruned.select(metaCols.map(m => col(quoteName(m))) ++
              Seq(col("log_event_idx")) ++
              e.sparkSchema.fields.map(f =>
                try_variant_get(col("_var"), "$[\"" + f.name + "\"]",
                  f.dataType.sql).as(f.name)): _*)
          else
            pruned.withColumn("_rec", from_json(col("_raw"), e.sparkSchema))
              .select(metaCols.map(m => col(quoteName(m))) ++
                Seq(col("log_event_idx")) :+ col("_rec.*"): _*)
        val tsPred = (tsLo.map(col("`$_ts`") >= _) ++ tsHi.map(col("`$_ts`") <= _))
          .reduceOption(_ && _).getOrElse(lit(true))
        Some((e, df.filter(kqlPred && tsPred).drop("log_event_idx")))
      }
    }
    if (frames.isEmpty) return emptyResult

    // Projection.cpp: resolve each pattern against each schema's columns
    val resolvedPerSchema: Seq[(DataFrame, Seq[(String, DataType)])] = frames.map {
      case (_, df) =>
        (df, graft.search.KqlCompiler.resolveProjection(df.schema, selectCols))
    }
    val outCols = outTypesFor(frames.map(_._1))
    if (outCols.isEmpty) return emptyResult

    val parts = resolvedPerSchema.map { case (df, cols) =>
      val have = cols.map(_._1).toSet
      df.select(outCols.collect {
        case (nm, dt) if have.contains(nm) =>
          // dotted names navigate into structs here (resolution source);
          // after the alias the output column is literally named with dots
          val c = col(nm.split('.').map(quoteName).mkString("."))
          val src = cols.find(_._1 == nm).get._2
          val cast =
            if (src == dt) c
            else if (dt == StringType && (src.isInstanceOf[StructType] ||
              src.isInstanceOf[ArrayType])) to_json(c)
            else c.cast(dt)
          cast.as(nm)
      }: _*)
    }
    // union with null-fill for schema-absent projected columns
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
      .select(outCols.map { case (nm, _) => col(quoteName(nm)) }: _*)
  }

  /**
   * Ordered reconstruction of the original JSONL — `clp-s x` with
   * `--ordered` (JsonConstructor.cpp:64-141 `construct_in_order`): every
   * record is re-serialized from its typed leaves (document order and exact
   * numeric literals preserved — the marshalling the reference's
   * SchemaReader does from its columns) and globally sorted by
   * log_event_idx; Spark's range-partitioned sort IS the distributed k-way
   * merge over the per-schema tables. Returns (log_event_idx, json).
   */
  def extract(spark: SparkSession, outDir: String, ordered: Boolean = true): DataFrame = {
    val reser = udf((raw: String) =>
      JsonShape.reserialize(JsonShape.typedLeaves(raw)))
    val recs = spark.read.parquet(s"$outDir/records")
      .select(col("log_event_idx"), reser(col("_raw")).as("json"))
    // callers that re-shuffle (e.g. JsonExtract's chunked writer) skip the
    // global range sort instead of paying for ordering they then destroy
    if (ordered) recs.orderBy("log_event_idx") else recs
  }
}

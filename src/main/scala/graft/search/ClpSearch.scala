package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Wildcard
import graft.functions.ClpFunctions._
import graft.pipeline.ClpPipeline

/**
 * Wildcard search over the routed tables — the `clg` lifecycle (SURVEY §3.1)
 * on Spark: compile → prune sinks/logtypes via the dictionaries → encoded-
 * domain filter (`isin` + subsequence match, no decompression) → decode only
 * candidate rows → final wildcard verify iff the subquery is imprecise →
 * limit / top-k / count / count-by-time.
 */
final class ClpSearch(spark: SparkSession, outDir: String) {

  lazy val routed: DataFrame = spark.read.parquet(s"$outDir/routed")
  private lazy val logtypeDict: Array[(Long, String, Int)] =
    spark.read.parquet(s"$outDir/logtype_dict")
      .select("logtype_id", "logtype", "sink_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
  private lazy val varDict: Map[String, Long] =
    spark.read.parquet(s"$outDir/var_dict").select("value", "var_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  private lazy val varDictInv: Map[Long, String] = varDict.map(_.swap)

  private lazy val logtypeDictDf: DataFrame =
    spark.read.parquet(s"$outDir/logtype_dict").select("logtype_id", "logtype")

  /** Adds a byte-exact `text` column decoded from the dictionaries only. */
  def withDecodedText(rows: DataFrame): DataFrame = {
    val bcInv = spark.sparkContext.broadcast(varDictInv)
    val dictValsOf = udf((logtype: String, vars: Seq[Long]) => {
      val kinds = ClpPipeline.placeholderKinds(logtype)
      kinds.iterator.zip(vars.iterator).collect { case ('d', v) => bcInv.value(v) }.toSeq
    })
    val encValsOf = udf((logtype: String, vars: Seq[Long]) => {
      val kinds = ClpPipeline.placeholderKinds(logtype)
      kinds.iterator.zip(vars.iterator).collect { case (k, v) if k != 'd' => v }.toSeq
    })
    rows
      .join(broadcast(logtypeDictDf), Seq("logtype_id"))
      .withColumn("text", clp_decode(col("logtype"),
        encValsOf(col("logtype"), col("vars")),
        dictValsOf(col("logtype"), col("vars"))))
      .drop("logtype")
  }

  /** Wildcard probe of the var dictionary (Q4) — driver-resident like the
    * reference's in-memory dicts. */
  private def varDictScan(pattern: String, caseSensitive: Boolean): Seq[Long] =
    varDict.iterator.collect {
      case (value, id) if Wildcard.matches(value, pattern, caseSensitive) => id
    }.toSeq

  /** Core: candidate rows for a query, in the encoded domain; `None` when the
    * dictionaries prove no row can match (WontMatch short-circuit). */
  def candidates(query: String, caseSensitive: Boolean = true,
                 tsLo: Option[java.sql.Timestamp] = None,
                 tsHi: Option[java.sql.Timestamp] = None): Option[(DataFrame, Boolean)] = {
    WildcardQueryCompiler.compile(query, varDict.get(_),
        varDictScan(_, caseSensitive), caseSensitive) match {
      case WildcardQueryCompiler.WontMatch => None
      case WildcardQueryCompiler.Plan(c) =>
        var df = routed
        tsLo.foreach(lo => df = df.filter(col("ts") >= lit(lo)))
        tsHi.foreach(hi => df = df.filter(col("ts") <= lit(hi)))
        if (c.matchAll) return Some((df, false))
        // per subquery: Q5 wildcard scan of the logtype dictionary → logtype
        // set, then encoded-domain var constraints (R12: no decode yet); the
        // query is the OR of its subqueries, evaluated in one scan (J1)
        val compiled = c.subplans.flatMap { sp =>
          val matched = logtypeDict.filter { case (_, lt, _) =>
            Wildcard.matches(lt, sp.logtypePattern, caseSensitive)
          }
          if (matched.isEmpty) None
          else {
            var cond = col("logtype_id").isin(matched.map(_._1.asInstanceOf[Any]): _*)
            if (sp.exactVars.nonEmpty)
              cond = cond && subseq_match(col("vars"), typedLit(sp.exactVars))
            sp.anyOfVarSets.foreach { ids =>
              cond = cond && arrays_overlap(col("vars"), typedLit(ids))
            }
            Some((cond, matched.map(_._3)))
          }
        }
        if (compiled.isEmpty) return None
        val sinks = compiled.flatMap(_._2).distinct
        // partition pruning on sink_id, then the subquery disjunction
        df = df.filter(col("sink_id").isin(sinks.map(_.asInstanceOf[Any]): _*))
          .filter(compiled.map(_._1).reduce(_ || _))
        Some((df, c.verifyText))
    }
  }

  /** Full search: decoded matching rows (conv_id, turn_idx, ts, text). */
  def search(query: String, caseSensitive: Boolean = true,
             tsLo: Option[java.sql.Timestamp] = None,
             tsHi: Option[java.sql.Timestamp] = None,
             limit: Option[Int] = None): DataFrame = {
    val empty = spark.emptyDataFrame
      .withColumn("conv_id", lit("")).withColumn("turn_idx", lit(0))
      .withColumn("ts", lit(null).cast("timestamp")).withColumn("text", lit(""))
      .limit(0)
    candidates(query, caseSensitive, tsLo, tsHi) match {
      case None => empty.select("conv_id", "turn_idx", "ts", "text")
      case Some((df, verify)) =>
        val cleaned = Wildcard.cleanUp(query)
        var out = withDecodedText(df)
        if (verify)
          out = out.filter(wildcard_match(col("text"), lit(cleaned), lit(caseSensitive)))
        out = out.select("conv_id", "turn_idx", "ts", "text")
        limit.map(out.limit).getOrElse(out)
    }
  }

  /** Top-k latest results by timestamp — the results-cache semantics
    * (clo/OutputHandler.hpp:121-224) as TakeOrderedAndProject. */
  def topK(query: String, k: Int, caseSensitive: Boolean = true): DataFrame =
    search(query, caseSensitive)
      .orderBy(desc("ts"), col("conv_id"), col("turn_idx")).limit(k)

  /** Distributed count (A1) — partial/final agg is Spark-native. */
  def count(query: String, caseSensitive: Boolean = true): Long =
    search(query, caseSensitive).count()

  /** Count-by-time (A2): bucket = floor(ts_ms / bucket_ms) * bucket_ms. */
  def countByTime(query: String, bucketMs: Long, caseSensitive: Boolean = true): DataFrame =
    search(query, caseSensitive)
      .withColumn("bucket",
        (floor(unix_millis(col("ts")) / lit(bucketMs)) * lit(bucketMs)))
      .groupBy("bucket")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
      .orderBy("bucket")
}

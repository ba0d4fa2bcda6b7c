package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.TokenizerSchema
import graft.functions.ClpFunctions._
import graft.pipeline.{ClpPipeline, TranscriptGen}

/** Grok/schema tokenizer mode end-to-end + timestamp pattern expressions. */
class SchemaModeSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = TokenizerSchema.parse(
    """delimiters: \s\t\r\n
      |timestamp:[0-9]{4}\-[0-9]{2}\-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}[,\.][0-9]{0,3}
      |int:\-{0,1}[0-9]+
      |float:\-{0,1}[0-9]+\.[0-9]+
      |hasNumber:[^ \r\n]*[0-9][^ \r\n]*
      |equals:=[^ \r\n]*[a-zA-Z0-9][^ \r\n]*
      |""".stripMargin)

  test("clp_encode_schema round-trips through Spark plans") {
    implicit val s = spark
    val msgs = Seq(
      "2016-05-08 07:34:05.251 task 42 done ratio 0.75 mode=fast",
      "no variables here", "counts 1 2 3")
    val df = msgs.toDF("text")
      .withColumn("enc", clp_encode_schema(col("text"), schema))
      .withColumn("rt", clp_decode(col("enc.logtype"), col("enc.encoded_vars"), col("enc.dict_vars")))
    assert(df.filter(col("rt") =!= col("text")).count() == 0)
    // schema classification visible in the encoded row: the timestamp is a
    // dictionary var; 42 → int and 0.75 → float placeholders
    val first = df.select(col("enc.dict_vars"), col("enc.encoded_vars")).head
    assert(first.getSeq[String](0).contains("2016-05-08 07:34:05.251"))
    assert(first.getSeq[Long](1).length == 2)
  }

  test("full pipeline runs in schema mode with byte-exact decode") {
    val outDir = Files.createTempDirectory("graft-schema-pipe").toString
    val turns = TranscriptGen.turns(spark, 800, seed = 3L).toDF.cache()
    val cfg = ClpPipeline.Config(outDir, maxSinks = 4, saltParts = 4,
      tokenizerSchema = Some(schema))
    val res = ClpPipeline.run(spark, turns, cfg)
    assert(res.rowsRouted == res.turnsIn && res.turnsIn > 500)
    assert(ClpPipeline.roundTripViolations(spark, turns, outDir).count() == 0)
  }

  test("ts_pattern_parse / ts_pattern_format are byte-exact inverses") {
    val df = Seq(
      "2015-01-31T15:50:45.392 rest of line",
      "[20170106-16:56:41] boot",
      "01 Jan 2016 15:50:17,085 gc start",
      "INFO [main] 2015-01-31 15:50:45,085 starting", // mid-line ts (2 spaces before)
      "no timestamp at all").toDF("line")
      .withColumn("p", ts_pattern_parse(col("line")))
    assert(df.filter(col("p").isNull).count() == 1)
    val rt = df.filter(col("p").isNotNull)
      .withColumn("rendered", ts_pattern_format(col("p.pattern_id"), col("p.epoch_ms")))
      .withColumn("original_span",
        expr("substring(line, p.ts_begin + 1, p.ts_end - p.ts_begin)"))
    assert(rt.filter(col("rendered") =!= col("original_span")).count() == 0)
  }
}

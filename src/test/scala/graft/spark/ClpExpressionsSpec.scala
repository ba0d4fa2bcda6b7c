package graft.spark

import org.apache.spark.sql.functions._
import graft.functions.ClpFunctions._
import graft.core.ClpEncoding

class ClpExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("clp_encode/clp_decode round-trips through Spark plans (codegen path)") {
    val msgs = Seq(
      "2016-05-08 07:34:05.251 MyDog123 APet4123\\test.txt",
      "job 12 took 0.345 s at path=/usr/bin/x7 rc=-3",
      "latency p99=1.500 ms count=007 id=0x7F",
      "weird \u0011\u0012\u0013 bytes C:\\dir\\file7",
      "", "no vars at all")
    val df = msgs.toDF("text")
      .withColumn("enc", clp_encode($"text"))
      .withColumn("decoded", clp_decode($"enc.logtype", $"enc.encoded_vars", $"enc.dict_vars"))
    val rows = df.select($"text", $"decoded").collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("clp_encode matches the core library exactly") {
    val msg = "checksum 231ACDFE21 verified for asd=asd123asd pi 3.1400"
    val row = Seq(msg).toDF("text").select(clp_encode($"text").as("e"))
      .select($"e.logtype", $"e.dict_vars", $"e.encoded_vars").head()
    val expect = ClpEncoding.encode(msg)
    assert(row.getString(0) == expect.logtype)
    assert(row.getSeq[String](1) == expect.dictVars.toSeq)
    assert(row.getSeq[Long](2) == expect.encodedVars.toSeq)
  }

  test("wildcard_match as a filter predicate") {
    val df = Seq("connection error 500 from 10.0.0.1", "all good", "Error 404").toDF("text")
    assert(df.filter(wildcard_match($"text", lit("*error 500*"))).count() == 1)
    assert(df.filter(wildcard_match($"text", lit("*error*"), lit(false))).count() == 2)
    // SQL registration
    assert(spark.sql(
      "SELECT wildcard_match('abcccd', '*ccd') a, wildcard_match('a12b12', '*12*23') b")
      .head() == org.apache.spark.sql.Row(true, false))
  }

  test("subseq_match in the encoded domain") {
    val df = Seq(
      (Seq(5L, 7L, 9L, 11L), Seq(7L, 11L)),
      (Seq(5L, 7L, 9L, 11L), Seq(11L, 7L)),
      (Seq(5L), Seq.empty[Long])).toDF("vars", "q")
    val got = df.select(subseq_match($"vars", $"q")).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
  }

  test("clp_merge_vars splices dict ids in CLP order") {
    val e = ClpEncoding.encode("job 12 took 0.5 s at path=/x7 rc=-3")
    val df = Seq((e.logtype, e.encodedVars.toSeq, Seq(42L))).toDF("lt", "enc", "ids")
    val merged = df.select(clp_merge_vars($"lt", $"enc", $"ids")).as[Seq[Long]].head()
    assert(merged.length == 4 && merged(2) == 42L)
  }
}

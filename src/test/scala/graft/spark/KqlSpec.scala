package graft.spark

import org.apache.spark.sql.functions._

import graft.search.{Kql, KqlCompiler}

/** Parse-shape tests mirroring the reference's test-kql.cpp plus end-to-end
  * filter equivalence against hand-written predicates (the reference's
  * (query → expected id set) style, test-clp_s-search.cpp:205-258). */
class KqlSpec extends SparkSpecBase {
  import spark.implicits._

  test("parse shapes from the reference suite") {
    assert(Kql.parse("* : value") == Right(Kql.Filter(Nil, Kql.Eq, "value")))
    assert(Kql.parse("key : value") == Right(Kql.Filter(Seq("key"), Kql.Eq, "value")))
    assert(Kql.parse("NOT key : value") ==
      Right(Kql.Not(Kql.Filter(Seq("key"), Kql.Eq, "value"))))
    assert(Kql.parse("a : a AND b : b") == Right(Kql.And(
      Kql.Filter(Seq("a"), Kql.Eq, "a"), Kql.Filter(Seq("b"), Kql.Eq, "b"))))
    assert(Kql.parse("a : a OR b : b") == Right(Kql.Or(
      Kql.Filter(Seq("a"), Kql.Eq, "a"), Kql.Filter(Seq("b"), Kql.Eq, "b"))))
    assert(Kql.parse("a > 5") == Right(Kql.Filter(Seq("a"), Kql.Gt, "5")))
    assert(Kql.parse("a <= 5.0") == Right(Kql.Filter(Seq("a"), Kql.Lte, "5.0")))
    // nested query prefixes the column path
    assert(Kql.parse("a : {b : c}") == Right(Kql.Filter(Seq("a", "b"), Kql.Eq, "c")))
    assert(Kql.parse("a.b : c") == Right(Kql.Filter(Seq("a", "b"), Kql.Eq, "c")))
    // value lists
    assert(Kql.parse("a : (v1 OR v2)") == Right(Kql.Or(
      Kql.Filter(Seq("a"), Kql.Eq, "v1"), Kql.Filter(Seq("a"), Kql.Eq, "v2"))))
    assert(Kql.parse("a : (AND v1 v2)") == Right(Kql.And(
      Kql.Filter(Seq("a"), Kql.Eq, "v1"), Kql.Filter(Seq("a"), Kql.Eq, "v2"))))
    // quoted values keep spaces; date literals flagged
    assert(Kql.parse("msg : \"two words\"") ==
      Right(Kql.Filter(Seq("msg"), Kql.Eq, "two words")))
    assert(Kql.parse("ts > date(2024-01-01)") ==
      Right(Kql.Filter(Seq("ts"), Kql.Gt, "2024-01-01", isDate = true)))
    // left-assoc equal precedence: a AND b OR c == (a AND b) OR c
    assert(Kql.parse("a:1 AND b:2 OR c:3") == Right(Kql.Or(
      Kql.And(Kql.Filter(Seq("a"), Kql.Eq, "1"), Kql.Filter(Seq("b"), Kql.Eq, "2")),
      Kql.Filter(Seq("c"), Kql.Eq, "3"))))
    // a quoted value ending in an escaped backslash must not swallow the
    // closing quote (\\ consumes as a pair)
    assert(Kql.parse("""msg : "path\\" AND a : 1""") == Right(Kql.And(
      Kql.Filter(Seq("msg"), Kql.Eq, """path\\"""),
      Kql.Filter(Seq("a"), Kql.Eq, "1"))))
    // a bare value inside a nested query scopes to the prefix subtree,
    // not to every column in the schema
    assert(Kql.parse("a : {foo OR b : 1}") == Right(Kql.Or(
      Kql.Filter(Seq("a", "*"), Kql.Eq, "foo"),
      Kql.Filter(Seq("a", "b"), Kql.Eq, "1"))))
    // at top level a bare value still matches any column
    assert(Kql.parse("foo") == Right(Kql.Filter(Nil, Kql.Eq, "foo")))
    assert(Kql.parse("a :").isLeft)
    assert(Kql.parse("(a : 1").isLeft)
  }

  private lazy val df = Seq(
    (0L, "error", 99.5, "api", true),
    (1L, "view", 12.0, "web", false),
    (2L, "error", 50.0, "web", true),
    (3L, "signup", 75.5, "api", false),
    (4L, "error-page", 3.25, "batch", true)
  ).toDF("id", "event_type", "value", "source", "ok")

  private def ids(kql: String): Set[Long] =
    KqlCompiler.filter(df, kql).select("id").as[Long].collect().toSet

  test("filter equivalence on a typed table") {
    assert(ids("event_type : error") == Set(0L, 2L))
    assert(ids("event_type : error*") == Set(0L, 2L, 4L))
    assert(ids("NOT event_type : error") == Set(1L, 3L, 4L))
    assert(ids("value > 50") == Set(0L, 3L))
    assert(ids("value >= 50") == Set(0L, 2L, 3L))
    assert(ids("event_type : error AND value >= 99") == Set(0L))
    assert(ids("event_type : (error OR signup)") == Set(0L, 2L, 3L))
    assert(ids("ok : true") == Set(0L, 2L, 4L))
    assert(ids("* : web") == Set(1L, 2L))
    assert(ids("value : 12") == Set(1L)) // int literal matches float column
    assert(ids("nosuchcol : x") == Set.empty[Long])
    assert(ids("source : a*") == Set(0L, 3L))
  }

  test("NOT matches records where the column is NULL (null-safe negation)") {
    val withNulls = Seq(
      (0L, "bash"), (1L, "python"), (2L, null.asInstanceOf[String])
    ).toDF("id", "tool")
    def got(kql: String): Set[Long] =
      KqlCompiler.filter(withNulls, kql).select("id").as[Long].collect().toSet
    // KQL NOT = "not matched by the inner filter", which includes missing
    // values — three-valued !pred would silently drop id=2
    assert(got("NOT tool : bash") == Set(1L, 2L))
    assert(got("NOT tool : nosuch") == Set(0L, 1L, 2L))
  }

  test("nested column paths") {
    val nested = df.select(struct(col("event_type"), col("value")).as("evt"), col("id"))
    val got = KqlCompiler.filter(nested, "evt : {event_type : error}")
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 2L))
    val got2 = KqlCompiler.filter(nested, "evt.value > 50")
      .select("id").as[Long].collect().toSet
    assert(got2 == Set(0L, 3L))
    val got3 = KqlCompiler.filter(nested, "*.value > 50")
      .select("id").as[Long].collect().toSet
    assert(got3 == Set(0L, 3L))
  }

  test("timestamp range with date literal") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n = KqlCompiler.filter(events, "ts >= date(2024-01-01) AND event_type : error").count()
    val exp = events.filter(col("ts") >= to_timestamp(lit("2024-01-01")) &&
      col("event_type") === "error").count()
    assert(n == exp && n > 0)
  }
}

package graft.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path: a
  * session built with the injector resolves every graft function in pure SQL
  * with no `ClpFunctions.register` call. The conf-string loader itself is
  * Spark's machinery; what it requires of us — a public zero-arg class
  * implementing `SparkSessionExtensions => Unit` — is asserted by
  * instantiating through the same reflective route Spark uses. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("injected session answers graft SQL without register()") {
    SharedSpark.spark // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(!(prevActive contains s), "builder must have created a NEW session")
      // full encode→decode round trip, SQL only (built-in resolution, no temp
      // function was registered on this session)
      val row = s.sql(
        """SELECT clp_decode(e.logtype, e.encoded_vars, e.dict_vars) AS text,
          |       e.logtype AS logtype
          |FROM (SELECT clp_encode('took 37 ms from host-3') AS e)""".stripMargin)
        .collect().head
      assert(row.getString(0) == "took 37 ms from host-3")
      assert(row.getString(1).contains("took"))
      assert(s.sql("SELECT wildcard_match('error on host-3', '*host-?*')")
        .collect().head.getBoolean(0))
      assert(s.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .collect().head.getDouble(0) == 11.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("class loads exactly the way spark.sql.extensions loads it") {
    // Spark's loadExtensions: Class.forName(name) → zero-arg ctor →
    // Function1[SparkSessionExtensions, Unit]. If any of those breaks
    // (ctor args added, visibility reduced), the conf-string path dies on a
    // real cluster even though withExtensions still compiles here.
    val cls = Class.forName("graft.GraftExtensions")
    val f = cls.getConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    f(new SparkSessionExtensions) // must inject without throwing
  }
}

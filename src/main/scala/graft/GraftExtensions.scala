package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Cluster-wide function registration — the spark-submit deployment path the
 * reference exposes through its CLI binaries. A cluster admin sets
 *
 *   --conf spark.sql.extensions=graft.GraftExtensions
 *
 * once and every SparkSession on the cluster (jobs, thrift server, SQL
 * notebooks) gets the graft Catalyst expressions (`clp_encode`,
 * `wildcard_match`, `vec_dot`, …) as resolved built-ins — in pure SQL, with
 * no driver-side `ClpFunctions.register(spark)` call and no Scala imports.
 *
 * Spark instantiates this class by name (it must stay public with a zero-arg
 * constructor and extend `SparkSessionExtensions => Unit`). The function
 * table itself lives in [[graft.functions.ClpFunctions.builders]], shared
 * with the session-scoped `register` path so the two cannot drift.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.ClpFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ClpExpressions", name),
        builder))
    }
}

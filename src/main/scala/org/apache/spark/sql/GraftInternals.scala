package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the one `private[sql]` API this library needs: Column →
  * Catalyst Expression (removed from Column's public surface in Spark 4's
  * Connect-compatible API). Used for driver-side constant-fold checks on
  * compiled predicates before any plan is built — the same package-placed
  * accessor pattern other Spark extension libraries use. */
object GraftInternals {
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Runs `body` with `spark` as the thread's active session. Plans built on
    * a non-main driver thread otherwise read the DEFAULT SQLConf (active
    * session and SQLConf are thread-locals), silently dropping session conf
    * like spark.sql.shuffle.partitions — required by the fleet search's
    * parallel per-archive plan construction. */
  def withActive[A](spark: SparkSession)(body: => A): A =
    spark.asInstanceOf[classic.SparkSession].withActive(body)

  /**
   * Driver-side constant value of a predicate Column after short-circuit
   * boolean simplification, or None when it does not fold. Catalyst's own
   * BooleanSimplification runs only inside plan optimization; this runs the
   * same AND/OR/NOT short-circuits BEFORE any plan exists, so a compiled
   * per-schema predicate like `false && (k >= 50)` is recognized as
   * constant-false and the schema's scan is never built (plan size stays
   * O(matching schemas), not O(catalog)).
   */
  def foldedValue(c: Column): Option[Any] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{And, Coalesce, Literal, Not, Or}
    // Column combinators (&&, ||, !, coalesce) build UNRESOLVED function
    // nodes in Spark 4's Connect-compatible Column API; rewrite the boolean
    // ones to their resolved Catalyst forms so the short-circuits below see
    // them (without this, `pred && lit(false)` arrives as 'and(...) and
    // never folds).
    def norm(e: Expression): Expression = e match {
      case f: UnresolvedFunction =>
        (f.nameParts.map(_.toLowerCase).mkString("."),
          f.arguments.map(norm)) match {
          case ("and", Seq(l, r)) => And(l, r)
          case ("or", Seq(l, r)) => Or(l, r)
          case ("not", Seq(x)) => Not(x)
          case ("coalesce", args) => Coalesce(args)
          case (_, args) => f.copy(arguments = args)
        }
      case other => other.mapChildren(norm)
    }
    def simp(e: Expression): Expression = e match {
      case And(l, r) =>
        (simp(l), simp(r)) match {
          case (Literal(false, _), _) | (_, Literal(false, _)) => Literal(false)
          case (Literal(true, _), rr) => rr
          case (ll, Literal(true, _)) => ll
          case (ll, rr) => And(ll, rr)
        }
      case Or(l, r) =>
        (simp(l), simp(r)) match {
          case (Literal(true, _), _) | (_, Literal(true, _)) => Literal(true)
          case (Literal(false, _), rr) => rr
          case (ll, Literal(false, _)) => ll
          case (ll, rr) => Or(ll, rr)
        }
      case Not(x) =>
        simp(x) match {
          case Literal(b: Boolean, _) => Literal(!b)
          case Literal(null, _) => Literal(null, e.dataType)
          case s => Not(s)
        }
      case Coalesce(children) =>
        val cs = children.map(simp)
        cs.find {
          case Literal(v, _) => v != null
          case _ => false
        } match {
          case Some(firstNonNull) if cs.takeWhile(_ != firstNonNull).forall {
                case Literal(null, _) => true
                case _ => false
              } => firstNonNull
          case _ => Coalesce(cs)
        }
      case other if scala.util.Try(other.foldable).getOrElse(false) =>
        scala.util.Try(Literal.create(other.eval(null), other.dataType))
          .getOrElse(other)
      case other => other
    }
    simp(norm(expression(c))) match {
      case Literal(v, _) => Some(v)
      case _ => None
    }
  }
}

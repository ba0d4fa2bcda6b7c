package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Wildcard
import graft.functions.ClpFunctions.wildcard_match

/**
 * Compiles a KQL AST into a Catalyst `Column` predicate against a DataFrame
 * schema — the Spark twin of the reference's SchemaMatch + QueryRunner chain
 * (components/core/src/clp_s/search/SchemaMatch.cpp, QueryRunner.cpp); the
 * DNF / constant-folding / type-narrowing passes the reference hand-rolls
 * (OrOfAndForm.cpp, NarrowTypes.cpp, ConstantProp.cpp) come free from
 * Catalyst's BooleanSimplification / ConstantFolding once the predicate is
 * declarative.
 *
 * Wildcard column paths (`a.*.c`, pure `*`) resolve against the schema at
 * compile time (Q9); a filter whose path matches nothing folds to false.
 */
object KqlCompiler {

  /** Leaf = (full path, dataType). */
  private def leaves(schema: StructType, prefix: Seq[String] = Nil): Seq[(Seq[String], DataType)] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => leaves(st, prefix :+ f.name)
        case dt => Seq((prefix :+ f.name) -> dt)
      }
    }

  private def pathMatches(pattern: Seq[String], path: Seq[String]): Boolean = {
    // per-segment wildcard match; a lone '*' segment spans exactly one level
    // except leading/trailing '*' which may span multiple (reference semantics
    // for leading/trailing wildcards in SchemaMatch)
    if (pattern.isEmpty) return true // pure wildcard column
    def seg(p: String, s: String): Boolean =
      Wildcard.matches(s, Wildcard.cleanUp(p), caseSensitive = true)
    if (pattern.length == path.length && pattern.zip(path).forall((seg _).tupled)) return true
    if (pattern.headOption.contains("*") && pattern.length <= path.length &&
        pattern.tail.zip(path.takeRight(pattern.length - 1)).forall((seg _).tupled)) return true
    if (pattern.lastOption.contains("*") && pattern.length <= path.length &&
        pattern.init.zip(path.take(pattern.length - 1)).forall((seg _).tupled)) return true
    false
  }

  private def unescapeValue(v: String): String = Wildcard.unescape(v)
  private def hasWildcard(v: String): Boolean = {
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\') i += 2
      else if (c == '*' || c == '?') return true
      else i += 1
    }
    false
  }

  /** One leaf-level comparison; None when the (type, op, value) combination is
    * impossible (reference NarrowTypes drops the branch — we fold to false). */
  private def leafPredicate(path: Seq[String], dt: DataType, op: Kql.Op,
                            value: String, isDate: Boolean): Option[Column] = {
    val c = col(path.mkString("."))
    def num: Option[Double] = value.toDoubleOption
    def lng: Option[Long] = value.toLongOption
    (op, dt) match {
      case (Kql.Eq, StringType) =>
        Some(
          if (hasWildcard(value)) wildcard_match(c, lit(Wildcard.cleanUp(value)))
          else c === lit(unescapeValue(value)))
      case (Kql.Eq, _: NumericType) =>
        num.map(d => c === lit(d)) // float/int equality: 1 matches 1.0
      case (Kql.Eq, BooleanType) =>
        value.toLowerCase match {
          case "true" => Some(c === lit(true))
          case "false" => Some(c === lit(false))
          case _ => None
        }
      case (Kql.Eq, TimestampType | TimestampNTZType) =>
        Some(c === to_timestamp(lit(value)))
      case (_, StringType) => Some(rangeOp(c, op, lit(value))) // lexicographic
      case (_, _: NumericType) => num.map(d => rangeOp(c, op, lit(d)))
      case (_, TimestampType | TimestampNTZType) =>
        Some(rangeOp(c.cast("timestamp"), op, to_timestamp(lit(value))))
      case _ => None
    }
  }

  private def rangeOp(c: Column, op: Kql.Op, v: Column): Column = op match {
    case Kql.Lt => c < v
    case Kql.Gt => c > v
    case Kql.Lte => c <= v
    case Kql.Gte => c >= v
    case Kql.Eq => c === v
  }

  def compile(expr: Kql.Expr, schema: StructType): Column = expr match {
    case Kql.And(l, r) => compile(l, schema) && compile(r, schema)
    case Kql.Or(l, r) => compile(l, schema) || compile(r, schema)
    // KQL NOT matches every record the inner filter does NOT match,
    // including records where the column is missing/NULL — under SQL
    // three-valued logic a bare !pred would drop NULL rows, so the inner
    // predicate is null-coalesced to false first.
    case Kql.Not(e) => !coalesce(compile(e, schema), lit(false))
    case Kql.Filter(pattern, op, value, isDate) =>
      val matched = leaves(schema).filter { case (p, _) => pathMatches(pattern, p) }
      val preds = matched.flatMap { case (p, dt) => leafPredicate(p, dt, op, value, isDate) }
      if (preds.isEmpty) lit(false) else preds.reduce(_ || _)
  }

  /** Parse + filter in one step. */
  def filter(df: DataFrame, kql: String): DataFrame =
    Kql.parse(kql) match {
      case Right(ast) => df.filter(compile(ast, df.schema))
      case Left(err) => throw new IllegalArgumentException(s"KQL parse error: $err")
    }
}

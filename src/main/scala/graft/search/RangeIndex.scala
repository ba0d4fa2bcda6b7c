package graft.search

import graft.core.Wildcard

/**
 * The clp_s archive range index re-expressed
 * (components/core/src/clp_s/RangeIndexWriter.hpp:17-38,
 * archive_constants.hpp:41-45): per-ingest-source metadata key/value pairs
 * (`$_filename`, `$_file_split_number`, `$_archive_creator_id`, …) attached
 * to a `[startIdx, endIdx)` span of `log_event_idx`. KQL filters on the `$`
 * namespace are evaluated against these entries at PLAN time
 * (search/EvaluateRangeIndexFilters.cpp) and rewritten into log_event_idx
 * range predicates: a filter matching no entry folds to FALSE (the
 * reference's EmptyExpr — no scan is compiled), and a matching one gains a
 * parquet-pushable index range alongside the row-level metadata predicate.
 *
 * Keeping the row-level predicate makes the rewrite an equivalence even
 * when ranges overlap (the reference forbids overlap by construction; we
 * tolerate interleaved ingest): every row whose metadata satisfies the
 * filter lies inside some matching entry's range, so
 * `filter ≡ inRanges ∧ filter` under any boolean nesting, NOT included.
 *
 * Simplification vs the reference: entry values are stored as strings and
 * compared with the same type rules the row predicates use (numeric when
 * both sides parse, wildcard match for string equality); the reference
 * routes values through its encoded-text AST
 * (EvaluateRangeIndexFilters.cpp get_encoded_text_ast +
 * evaluate_filter_against_literal_type_value_pair) to the same effect.
 * Entry matching only needs to be a SUPERSET of row matching (the row
 * predicate restores exactness), so any comparison this evaluator cannot
 * decide returns true — never a false negative.
 */
object RangeIndex {

  /** One index entry: metadata fields valid for `log_event_idx` ∈ [startIdx,
    * endIdx). Mirrors the reference's `{"s": …, "e": …, "f": {…}}` msgpack
    * row (RangeIndexWriter.hpp:20-30). */
  final case class Entry(startIdx: Long, endIdx: Long, fields: Map[String, String])

  /**
   * Does `entryValue` satisfy `(op, rawValue)`? Driver-side twin of
   * [[KqlCompiler]]'s leaf predicate semantics over one stored string:
   *   - `col: *` is an existence check — always true once the key exists
   *   - numeric comparison when both sides parse as numbers (so `0` matches
   *     a stored `0.0`, a superset of the typed row predicate)
   *   - wildcard match for Eq values containing unescaped `*`/`?`
   *   - a numeric range literal against a non-numeric value is the
   *     reference's impossible NarrowTypes branch — false
   *   - date literals are not decidable here — true (row predicate decides)
   */
  def satisfies(entryValue: String, op: Kql.Op, rawValue: String,
                isDate: Boolean = false): Boolean = {
    if (isDate) return true
    if (op == Kql.Eq && Wildcard.cleanUp(rawValue) == "*") return true
    val numLit = rawValue.toDoubleOption
    val numVal = entryValue.toDoubleOption
    op match {
      case Kql.Eq =>
        // `Double.compare` keeps NaN == NaN decidable (the row predicate
        // compares the stored STRING "NaN", which does match); plain ==
        // covers 0.0 vs -0.0, which compare() distinguishes but the row
        // predicate's numeric cast does not
        if (numLit.isDefined && numVal.isDefined)
          numVal.get == numLit.get ||
            java.lang.Double.compare(numVal.get, numLit.get) == 0
        else if (KqlCompiler.valueHasWildcard(rawValue))
          Wildcard.matches(entryValue,
            Wildcard.cleanUp(KqlCompiler.unescapeValue(rawValue, forPattern = true)),
            caseSensitive = true)
        else entryValue == KqlCompiler.unescapeValue(rawValue, forPattern = false)
      case _ =>
        (numLit, numVal) match {
          // a NaN on either side of a range op is not decidable here — the
          // row predicate's comparison semantics differ per column type, so
          // stay on the superset side and let it decide
          case (Some(l), Some(v)) if l.isNaN || v.isNaN => true
          case (Some(l), Some(v)) => cmp(java.lang.Double.compare(v, l), op)
          case (Some(_), None) => false
          case (None, _) =>
            cmp(entryValue.compareTo(
              KqlCompiler.unescapeValue(rawValue, forPattern = false)), op)
        }
    }
  }

  private def cmp(sign: Int, op: Kql.Op): Boolean = op match {
    case Kql.Lt => sign < 0
    case Kql.Gt => sign > 0
    case Kql.Lte => sign <= 0
    case Kql.Gte => sign >= 0
    case Kql.Eq => sign == 0
  }

  /** Coalesces [s,e) ranges — overlapping or adjacent spans merge, so the
    * injected predicate is one comparison pair per disjoint span. */
  def coalesceRanges(ranges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = ranges.filter(r => r._2 > r._1).sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (s, e) =>
      out.lastOption match {
        case Some((ps, pe)) if s <= pe => out(out.length - 1) = (ps, math.max(pe, e))
        case _ => out += ((s, e))
      }
    }
    out.toSeq
  }
}

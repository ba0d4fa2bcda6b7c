package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side range-index entry evaluation + span coalescing
  * (EvaluateRangeIndexFilters.cpp semantics — see [[RangeIndex]]). */
class RangeIndexSpec extends AnyFunSuite {
  import Kql.{Eq, Gt, Gte, Lt, Lte}

  test("existence and exact/wildcard string equality") {
    assert(RangeIndex.satisfies("any", Eq, "*"))
    assert(RangeIndex.satisfies("test_search.jsonl", Eq, "test_search.jsonl"))
    assert(!RangeIndex.satisfies("test_search.jsonl", Eq, "other.jsonl"))
    assert(RangeIndex.satisfies("logs/21.jsonl", Eq, "logs/*1.jsonl"))
    assert(!RangeIndex.satisfies("logs/12.jsonl", Eq, "logs/*1.jsonl"))
    assert(RangeIndex.satisfies("a*e", Eq, """a\*e"""))
    assert(!RangeIndex.satisfies("abce", Eq, """a\*e"""))
  }

  test("numeric comparison when both sides parse; impossible branch otherwise") {
    assert(RangeIndex.satisfies("0", Eq, "0.0"))
    assert(RangeIndex.satisfies("3", Gt, "2"))
    assert(!RangeIndex.satisfies("3", Lt, "2"))
    assert(RangeIndex.satisfies("3", Gte, "3"))
    assert(RangeIndex.satisfies("3", Lte, "3"))
    // numeric range literal vs non-numeric value: NarrowTypes drops it
    assert(!RangeIndex.satisfies("8f2b4a-creator", Gt, "0"))
    // non-numeric range literal: lexicographic, like the row predicate
    assert(RangeIndex.satisfies("beta", Gt, "alpha"))
    // date literals are not decided here (superset rule: row pred decides)
    assert(RangeIndex.satisfies("whatever", Gt, "2024-01-01", isDate = true))
  }

  test("NaN never breaks the superset rule") {
    // both sides parse as Double NaN: the row predicate compares the stored
    // STRING "NaN" (which matches), so Eq must not use NaN-propagating ==
    assert(RangeIndex.satisfies("NaN", Eq, "NaN"))
    assert(!RangeIndex.satisfies("NaN", Eq, "1.5"))
    assert(!RangeIndex.satisfies("1.5", Eq, "NaN"))
    // a NaN on either side of a range op is undecidable here — superset says
    // true, the row predicate decides
    assert(RangeIndex.satisfies("NaN", Gt, "0"))
    assert(RangeIndex.satisfies("3", Lte, "NaN"))
  }

  test("range coalescing merges overlapping and adjacent spans") {
    assert(RangeIndex.coalesceRanges(Seq((0L, 4L), (4L, 8L), (10L, 12L))) ==
      Seq((0L, 8L), (10L, 12L)))
    assert(RangeIndex.coalesceRanges(Seq((5L, 9L), (0L, 6L))) == Seq((0L, 9L)))
    assert(RangeIndex.coalesceRanges(Seq((3L, 3L), (1L, 2L))) == Seq((1L, 2L)))
    assert(RangeIndex.coalesceRanges(Nil) == Nil)
  }
}

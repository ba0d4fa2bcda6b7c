package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Vectors mirrored from the reference's test-regex_utils.cpp (semantics,
  * not code): simple translations, metachar errors, escapes, charsets,
  * case-insensitive charset pairs, anchor/prefix-suffix config. */
class RegexToWildcardSpec extends AnyFunSuite {
  import RegexToWildcard._

  private def ok(re: String, wc: String, cfg: Config = Config()): Unit =
    assert(translate(re, cfg) == Right(wc), s"regex '$re'")
  private def bad(re: String, cfg: Config = Config()): Unit =
    assert(translate(re, cfg).isLeft, s"regex '$re' should refuse")

  test("simple translations") {
    ok("", "")
    ok("xyz", "xyz")
    ok(". xyz .* zyx .", "? xyz * zyx ?")
    ok(". xyz .+ zyx .*", "? xyz ?* zyx *")
  }

  test("unescaped metachars refuse") {
    bad(".? xyz .* zyx .")
    bad(". xyz .** zyx .")
    bad(". xyz .*+ zyx .")
    bad(". xyz |.* zyx .")
    bad(". xyz ^.* zyx .")
    bad(". xyz $.* zyx .")
    bad("a(b)c")
    bad("a{2}")
  }

  test("escaped metachars") {
    ok("<>-_/=!", "<>-_/=!")
    ok("""\<\>\-\_\/\=\!""", "<>-_/=!")
    ok("""\*\+\?\|\^\$\.\{\}\[\]\(\)\<\>\-\_\/\=\!\\""",
       """\*+\?|^$.{}[]()<>-_/=!\\""")
    bad("abc\\Qdefghi\\Ejkl")
  }

  test("charsets: single-char sets translate, anything else refuses") {
    ok("x[y]z", "xyz")
    ok("x[\\^]z", "x^z")
    ok("x[\\]]z", "x]z")
    ok("x[-]z", "x-z")
    ok("x[\\-]z", "x-z")
    ok("x[\\\\]z", "x\\\\z")
    ok("""[a][b][\^][-][\-][\]][\\][c][d]""", """ab^--]\\cd""")
    bad("x[]y")
    bad("x[a-z]y")
    bad("x[^^]y")
    bad("x[^0-9]y")
    bad("[xX][yY]")
    bad("ch:[a-zA-Z0-9]")
    bad("[\\")
    bad("[\\\\")
    bad("[xX")
    bad("ch:[a-zA-Z0-9")
    // class shorthands inside charsets must refuse, never translate to the
    // literal letter ([\d] is NOT 'd')
    bad("x[\\d]y")
    bad("x[\\w]y")
    bad("x[\\s]y")
    bad("x[\\n]y")
  }

  test("case-insensitive config collapses same-letter pairs") {
    val ci = Config(caseInsensitive = true)
    ok("[xX][yY]", "xy", ci)
    ok("[Yy][Xx]", "yx", ci)
    ok("[aA][Bb][Cc]", "abc", ci)
    ok("""[aA][Bb][\^][-][\]][Cc][dD]""", "ab^-]cd", ci)
    bad("[xX", ci)
    bad("ch:[a-zA-Z0-9]", ci)
  }

  test("anchor + prefix/suffix wildcard config") {
    val sub = Config(addPrefixSuffixWildcards = true)
    ok("^", "*", sub)
    ok("$", "*", sub)
    ok("^xyz$", "xyz", sub)
    ok("xyz", "*xyz*", sub)
    ok("xyz$$", "*xyz", sub)
    bad("xyz$zyx$", sub)
  }
}

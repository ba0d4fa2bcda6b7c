package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Corpus mirrored from the reference's wildcard suite
  * (components/core/tests/test-string_utils.cpp). */
class WildcardSpec extends AnyFunSuite {
  import Wildcard._

  private def ok(tame: String, wild: String): Unit =
    assert(matchesCaseSensitive(tame, wild), s"'$tame' should match '$wild'")
  private def no(tame: String, wild: String): Unit =
    assert(!matchesCaseSensitive(tame, wild), s"'$tame' should NOT match '$wild'")

  test("clean_up_wildcard_search_string vectors") {
    assert(cleanUp("***") == "*")
    assert(cleanUp("*?*") == "*?*")
    assert(cleanUp("abc\\") == "abc")
    assert(cleanUp("\\*\\?\\\\") == "\\*\\?\\\\")
    assert(cleanUp("\\a") == "a")
  }

  test("unescape") {
    assert(unescape("\\*\\?\\\\") == "*?\\")
    assert(unescape("abcd\\") == "abcd")
  }

  test("repeating character sequences") {
    ok("abcccd", "*ccd")
    ok("mississipissippi", "*issip*ss*")
    no("xxxx*zzzzzzzzy*f", "xxxx*zzy*fffff")
    ok("xxxx*zzzzzzzzy*f", "xxx*zzy*f")
    no("xxxxzzzzzzzzyf", "xxxx*zzy*fffff")
    ok("xxxxzzzzzzzzyf", "xxxx*zzy*f")
    ok("xyxyxyzyxyz", "xy*z*xyz")
    ok("mississippi", "*sip*")
    ok("xyxyxyxyz", "xy*xyz")
    ok("mississippi", "mi*sip*")
    ok("ababac", "*abac*")
    ok("aaazz", "a*zz*")
    no("a12b12", "*12*23")
    no("a12b12", "a12b")
    ok("a12b12", "*12*12*")
  }

  test("'*' in the tame string") {
    ok("*", "*")
    ok("a*abab", "a*b")
    ok("a*r", "a*")
    no("a*ar", "a*aar")
  }

  test("case sensitivity") {
    ok("XYXYXYZYXYz", "XY*Z*XYz")
    ok("missisSIPpi", "*SIP*")
    ok("mississipPI", "*issip*PI")
    ok("miSsissippi", "mi*sip*")
    no("miSsissippi", "mi*Sip*")
    ok("abAbac", "*Abac*")
    ok("aAazz", "a*zz*")
    no("A12b12", "*12*23")
    ok("a12B12", "*12*12*")
    ok("oWn", "*oWn*")
    ok("bLah", "bLah")
    no("bLah", "bLaH")
    assert(matches("mississippi", "*issip*PI", caseSensitive = false))
    assert(!matches("mississippi", "*issip*PI", caseSensitive = true))
  }

  test("mixed wildcards") {
    ok("a", "*?"); ok("ab", "*?"); ok("abc", "*?")
    no("a", "??"); ok("ab", "?*?"); ok("ab", "*?*?*")
    ok("abcd", "?b*??"); no("abcd", "?a*??"); ok("abcde", "?*b*?*d*?")
    ok("bLah", "bL?h"); no("bLaaa", "bLa?"); ok("bLah", "bLa?")
    no("bLaH", "?Lah"); ok("bLaH", "?LaH")
  }

  test("many-wildcard scenarios") {
    ok("a" * 90 + "b", "a*a*a*a*a*a*aa*aaa*a*a*b")
    ok("abababababababababababababababababababaacacacacacacacadaeafagahaiajakalaaaaaaaaaaaaaaaaaffafagaagggagaaaaaaaab",
       "*a*b*ba*ca*a*aa*aaa*fa*ga*b*")
    no("abababababababababababababababababababaacacacacacacacadaeafagahaiajakalaaaaaaaaaaaaaaaaaffafagaagggagaaaaaaaab",
       "*a*b*ba*ca*a*x*aaa*fa*ga*b*")
    no("abababababababababababababababababababaacacacacacacacadaeafagahaiajakalaaaaaaaaaaaaaaaaaffafagaagggagaaaaaaaab",
       "*a*b*ba*ca*aaaa*fa*ga*gggg*b*")
    ok("abababababababababababababababababababaacacacacacacacadaeafagahaiajakalaaaaaaaaaaaaaaaaaffafagaagggagaaaaaaaab",
       "*a*b*ba*ca*aaaa*fa*ga*ggg*b*")
    ok("aaabbaabbaab", "*aabbaa*a*")
    ok("a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*", "a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*")
    ok("aaaaaaaaaaaaaaaaa", "*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*")
    no("aaaaaaaaaaaaaaaa", "*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*a*")
    no("abc*abcd*abcde*abcdef*abcdefg*abcdefgh*abcdefghi*abcdefghij*abcdefghijk*abcdefghijkl*abcdefghijklm*abcdefghijklmn",
       "abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*")
    ok("abc*abcd*abcde*abcdef*abcdefg*abcdefgh*abcdefghi*abcdefghij*abcdefghijk*abcdefghijkl*abcdefghijklm*abcdefghijklmn",
       "abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*")
    no("abc*abcd*abcd*abc*abcd", "abc*abc*abc*abc*abc")
    ok("abc*abcd*abcd*abc*abcd*abcd*abc*abcd*abc*abc*abcd",
       "abc*abc*abc*abc*abc*abc*abc*abc*abc*abc*abcd")
  }

  test("escaped wildcards match literally") {
    ok("st*r", "st\\*r")
    no("star", "st\\*r")
    ok("q?", "q\\?")
    no("qq", "q\\?")
    ok("a\\b", "a\\\\b")
  }

  test("empty edge cases") {
    ok("", "")
    ok("", "*")
    no("", "?")
    no("x", "")
  }

  test("typical apache log pattern") {
    ok("64.242.88.10 - - [07/Mar/2004:16:06:51 -0800] \"GET /twiki/bin/rdiff/TWiki/NewUserTemplate?rev1=1.3&rev2=1.2 HTTP/1.1\" 200 4523",
       "*64.242.88.10*Mar/2004*GET*200*")
  }
}

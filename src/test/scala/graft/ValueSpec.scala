package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.osl._

/** cvar semantics ported from the reference's lib_var suite
  * (/root/reference/test/test_lib_var.h) — the OSL-visible behaviors:
  * loose cross-type equality, string math, container +/-, coercions. */
class ValueSpec extends AnyFunSuite {

  test("string + scalar concatenates (cvar: \"49.5\" + 5 == \"49.55\")") {
    assert(Value.plus(VStr("49.5"), VInt(5)) == VStr("49.55"))
    assert(Value.plus(VStr("49.5"), VStr("5")) == VStr("49.55"))
    assert(Value.plus(VDbl(49.5), VInt(5)) == VDbl(54.5))
  }

  test("string - substring removes every occurrence (cvar::subStrings)") {
    assert(Value.minus(VStr("the rain in Spain"), VStr("Spain")) ==
      VStr("the rain in "))
    assert(Value.minus(VStr("aXbXc"), VStr("X")) == VStr("abc"))
    assert(Value.minus(VStr("aaa"), VStr("aa")) == VStr("a")) // re-scan after erase
  }

  test("cross-type loose equality (cvar: \"123\" == 123)") {
    assert(Value.eq(VStr("123"), VInt(123)))
    assert(Value.eq(VInt(123), VStr("123")))
    assert(Value.eq(VBool(true), VInt(1)))
    assert(!Value.eq(VNone, VInt(0)))
  }

  test("string numeric coercions (cvar: \"1234.5\" to all types)") {
    assert(VStr("1234.5").asLong == 1234L)
    assert(VStr("1234.5").asDouble == 1234.5)
    assert(VStr("not a number").asDouble == 0.0) // cvar converts failures to 0
  }

  test("container + and - (cvar list/set/dict math)") {
    val l = VList(Vector(VInt(1), VInt(2), VInt(3)))
    assert(Value.plus(l, VInt(4)) == VList(Vector(VInt(1), VInt(2), VInt(3), VInt(4))))
    assert(Value.minus(l, VInt(2)) == VList(Vector(VInt(1), VInt(3))))
    val s = VSet(Set[Value](VInt(1), VInt(2)))
    assert(Value.plus(s, VInt(2)) == s) // set dedup
    val d = VDict(Map("a" -> VInt(1), "b" -> VInt(2)))
    assert(Value.minus(d, VStr("a")) == VDict(Map("b" -> VInt(2))))
  }

  test("truthiness follows cvar bool conversion") {
    assert(!VNone.truthy && !VInt(0).truthy && !VStr("").truthy)
    assert(VInt(1).truthy && VStr("x").truthy && VDbl(0.1).truthy)
  }
}

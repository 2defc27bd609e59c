package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dsl.Parser
import graft.dsl.Parser.{Call, Raw}

class ParserSpec extends AnyFunSuite {

  test("bare expression falls through to Raw") {
    assert(Parser.parse("l_orderkey") == Raw("l_orderkey"))
    assert(Parser.parse("upper(c_name)") == Raw("upper(c_name)"))
  }

  test("simple call with args") {
    assert(Parser.parse("fn_transform_Concatenate(a,b)") ==
      Call("fn_transform_Concatenate", List(Raw("a"), Raw("b"))))
  }

  test("empty arg list") {
    assert(Parser.parse("fn_transform_Datetime()") ==
      Call("fn_transform_Datetime", Nil))
  }

  test("nested calls keep top-level comma split") {
    assert(Parser.parse("fn_transform_ClearString(fn_transform_Concatenate(a,b),$x)") ==
      Call("fn_transform_ClearString", List(
        Call("fn_transform_Concatenate", List(Raw("a"), Raw("b"))),
        Raw("$x"))))
  }

  test("rule text with pipes and arrows stays raw") {
    assert(Parser.parse("fn_transform_Case_with_default(c,a|b->x,$d)") ==
      Call("fn_transform_Case_with_default",
        List(Raw("c"), Raw("a|b->x"), Raw("$d"))))
  }

  test("unbalanced parens rejected, as in the reference validator") {
    assertThrows[Parser.ParseError](Parser.parse("fn_transform_Concatenate(a,b"))
    assertThrows[Parser.ParseError](Parser.parse("fn_transform_Concatenate a,b)"))
  }

  test("splitTopLevel tracks depth") {
    assert(Parser.splitTopLevel("a,f(b,c),d") == List("a", "f(b,c)", "d"))
  }
}

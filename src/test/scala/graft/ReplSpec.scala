package graft

import graft.tools.Repl

class ReplSpec extends SparkSpec {

  test("openDepth: balanced detection across lines, strings, comments") {
    assert(Repl.openDepth("func f(x) {") == 1)
    assert(Repl.openDepth("func f(x) {\n  return x\n}") == 0)
    assert(Repl.openDepth("func f(x) = x * 2") == 0)
    assert(Repl.openDepth("""t{a: "}"}""") == 0) // brace inside string
    assert(Repl.openDepth("t[a == '(']") == 0)   // paren inside string
    assert(Repl.openDepth("f( // (comment") == 1)
    assert(Repl.openDepth("[1..10]{v: item}") == 0)
  }

  test("isStatement: defs persist, expressions evaluate") {
    assert(Repl.isStatement("x = 5"))
    assert(Repl.isStatement("func f(a) = a + 1"))
    assert(Repl.isStatement("func g(a) {\n  return a * 2\n}"))
    assert(!Repl.isStatement("[1..10]"))
    assert(!Repl.isStatement("x + 1"))
    assert(!Repl.isStatement("f(3)"))
  }
}

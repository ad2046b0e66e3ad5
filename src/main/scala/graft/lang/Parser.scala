package graft.lang

/** Hand-rolled lexer + recursive-descent/Pratt parser for the core of
  * the reference language (grammar: reference preql/core/preql.lark):
  * projections `t{a, n: expr}` / group-by `t{k => aggs}`, selections
  * `t[conds]`, slices `t[a..b]`, `order {a, ^b}`, `update {...}`,
  * `delete [...]`, ranges `[a..b]`, lists `[1,2,3]`, function calls
  * with optional named args (`join(a: t1, b: t2)`), attribute access,
  * and the full binary-operator ladder incl. `/~`, `**`, `~`, `in`,
  * `!in`, and/or/not. No parser library — zero-dependency.
  */
object Ast {
  sealed trait Expr
  case class IntLit(v: Long) extends Expr
  case class FloatLit(v: Double) extends Expr
  case class StrLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class Ident(name: String) extends Expr
  case class Attr(obj: Expr, name: String) extends Expr
  case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  case class Unary(op: String, e: Expr) extends Expr
  case class Call(fn: String, args: Seq[Arg]) extends Expr
  case class Arg(name: Option[String], value: Expr)
  case class ListLit(items: Seq[Expr]) extends Expr
  /** `{..., x}` / `{... !a !b}` — include remaining columns. */
  case class EllipsisE(excludes: Seq[String]) extends Expr
  case class RangeLit(from: Option[Expr], until: Option[Expr]) extends Expr

  // table operators (postfix)
  case class Selection(t: Expr, conds: Seq[Expr]) extends Expr
  case class Slice(t: Expr, from: Option[Expr], until: Option[Expr]) extends Expr
  /** keys=None → plain projection; keys=Some(ks) → group-by (ks may be
    * empty for `{=>aggs}`); aggs empty with keys → distinct keys.
    */
  case class Projection(t: Expr, fields: Seq[Field], grouped: Boolean,
                        aggs: Seq[Field]) extends Expr
  case class Field(name: Option[String], value: Expr)
  case class Order(t: Expr, keys: Seq[(Expr, Boolean)]) extends Expr // (expr, asc)
  case class Update(t: Expr, fields: Seq[Field]) extends Expr
  case class Delete(t: Expr, conds: Seq[Expr]) extends Expr

  sealed trait Stmt
  case class Assign(name: String, value: Expr) extends Stmt
  /** `func f(a, b) = expr` — inlined at call sites like the reference
    * (reference evaluate.py:551-648 compile-and-inline).
    */
  case class FuncDef(name: String, params: Seq[String], body: Expr) extends Stmt
  /** `table += expr` — INSERT..SELECT (reference evaluate.py:278-287). */
  case class InsertRows(table: String, value: Expr) extends Stmt
  /** `new Table(col: value, ...)` — single-row insert
    * (reference evaluate.py:884-947).
    */
  case class NewRow(table: String, args: Seq[Arg]) extends Stmt
  case class Program(stmts: Seq[Stmt], result: Expr)
}

final case class ParseError(msg: String, pos: Int)
  extends RuntimeException(s"$msg at offset $pos")

object Lexer {
  sealed trait Tok { def pos: Int }
  case class TInt(v: Long, pos: Int) extends Tok
  case class TFloat(v: Double, pos: Int) extends Tok
  case class TStr(v: String, pos: Int) extends Tok
  case class TIdent(v: String, pos: Int) extends Tok
  case class TOp(v: String, pos: Int) extends Tok
  case class TEof(pos: Int) extends Tok

  private val multiOps = Seq("...", "=>", "..", "==", "!=", "<>", "<=", ">=",
    "/~", "**", "!in", "+=")
  private val singleOps = "{}[](),:.+-*/%<>=^~&|!"

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '#') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c.isDigit) {
        val start = i
        while (i < n && src(i).isDigit) i += 1
        // `1..5` must lex as int, "..", int — only treat '.' as decimal
        // point when not followed by another '.'
        if (i < n && src(i) == '.' && !(i + 1 < n && src(i + 1) == '.')) {
          i += 1
          while (i < n && src(i).isDigit) i += 1
          out += TFloat(src.substring(start, i).toDouble, start)
        } else out += TInt(src.substring(start, i).toLong, start)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val start = i
        i += 1
        val sb = new StringBuilder
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) {
            sb += (src(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case other => other
            })
            i += 2
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated string", start)
        i += 1
        out += TStr(sb.toString, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TIdent(src.substring(start, i), start)
      } else {
        val two = if (i + 2 <= n) src.substring(i, math.min(i + 3, n)) else ""
        multiOps.find(op => src.startsWith(op, i)) match {
          case Some(op) => out += TOp(op, i); i += op.length
          case None =>
            if (singleOps.contains(c)) { out += TOp(c.toString, i); i += 1 }
            else throw ParseError(s"unexpected character '$c'", i)
        }
      }
    }
    out += TEof(n)
    out.result()
  }
}

final class Parser(toks: Vector[Lexer.Tok]) {
  import Ast._
  import Lexer._

  private var p = 0
  private def cur: Tok = toks(p)
  private def advance(): Tok = { val t = cur; p += 1; t }
  private def isOp(v: String): Boolean = cur match {
    case TOp(o, _) => o == v; case _ => false
  }
  private def isIdent(v: String): Boolean = cur match {
    case TIdent(o, _) => o == v; case _ => false
  }
  private def expectOp(v: String): Unit =
    if (isOp(v)) p += 1 else throw ParseError(s"expected '$v'", cur.pos)

  // ---- program: assignments then a final expression ----------------------
  def parseProgram(): Program = {
    val stmts = Seq.newBuilder[Stmt]
    var result: Option[Expr] = None
    while (!cur.isInstanceOf[TEof]) {
      // lookahead: IDENT '=' (not '==')
      val isAssign = (cur, toks.lift(p + 1)) match {
        case (TIdent(_, _), Some(TOp("=", _))) =>
          toks.lift(p + 2) match {
            case Some(TOp("=", _)) => false // '=='
            case _ => true
          }
        case _ => false
      }
      val isInsert = (cur, toks.lift(p + 1)) match {
        case (TIdent(_, _), Some(TOp("+=", _))) => true
        case _ => false
      }
      if (isIdent("new")) {
        advance()
        val name = advance() match {
          case TIdent(v, _) => v
          case t => throw ParseError("expected table name after 'new'", t.pos)
        }
        expectOp("(")
        val args = Seq.newBuilder[Arg]
        var firstA = true
        while (!isOp(")")) {
          if (!firstA) expectOp(",")
          firstA = false
          (cur, toks.lift(p + 1)) match {
            case (TIdent(n2, _), Some(TOp(":", _))) =>
              advance(); advance()
              args += Arg(Some(n2), parseExpr())
            case _ => args += Arg(None, parseExpr())
          }
        }
        expectOp(")")
        stmts += NewRow(name, args.result())
      } else if (isInsert) {
        val name = advance().asInstanceOf[TIdent].v
        expectOp("+=")
        stmts += InsertRows(name, parseExpr())
      } else if (isIdent("func")) {
        advance()
        val name = advance() match {
          case TIdent(v, _) => v
          case t => throw ParseError("expected function name", t.pos)
        }
        expectOp("(")
        val params = Seq.newBuilder[String]
        var firstP = true
        while (!isOp(")")) {
          if (!firstP) expectOp(",")
          firstP = false
          params += (advance() match {
            case TIdent(v, _) => v
            case t => throw ParseError("expected parameter name", t.pos)
          })
        }
        expectOp(")")
        expectOp("=")
        stmts += FuncDef(name, params.result(), parseExpr())
      } else if (isAssign) {
        val name = advance().asInstanceOf[TIdent].v
        expectOp("=")
        stmts += Assign(name, parseExpr())
      } else {
        result = Some(parseExpr())
        if (!cur.isInstanceOf[TEof])
          throw ParseError("trailing input after final expression", cur.pos)
      }
    }
    Program(stmts.result(),
      result.getOrElse(throw ParseError("empty program", 0)))
  }

  def parseSingle(): Expr = {
    val e = parseExpr()
    if (!cur.isInstanceOf[TEof]) throw ParseError("trailing input", cur.pos)
    e
  }

  // ---- expression ladder --------------------------------------------------
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (isIdent("or")) { advance(); l = BinOp("or", l, parseAnd()) }
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (isIdent("and")) { advance(); l = BinOp("and", l, parseNot()) }
    l
  }
  private def parseNot(): Expr =
    if (isIdent("not")) { advance(); Unary("not", parseNot()) }
    else parseCompare()

  private val compareOps = Set("==", "!=", "<>", "<", "<=", ">", ">=", "!in")
  private def parseCompare(): Expr = {
    var l = parseLike()
    var done = false
    while (!done) {
      cur match {
        case TOp(o, _) if compareOps(o) =>
          advance(); l = BinOp(o, l, parseLike())
        case TIdent("in", _) =>
          advance(); l = BinOp("in", l, parseLike())
        case _ => done = true
      }
    }
    l
  }
  private def parseLike(): Expr = {
    var l = parseAdd()
    while (isOp("~") || isIdent("like")) { advance(); l = BinOp("~", l, parseAdd()) }
    l
  }
  private def parseAdd(): Expr = {
    var l = parseMul()
    var done = false
    while (!done) cur match {
      case TOp(o, _) if o == "+" || o == "-" || o == "&" || o == "|" =>
        advance(); l = BinOp(o, l, parseMul())
      case _ => done = true
    }
    l
  }
  private def parseMul(): Expr = {
    var l = parsePower()
    var done = false
    while (!done) cur match {
      case TOp(o, _) if o == "*" || o == "/" || o == "%" || o == "/~" =>
        advance(); l = BinOp(o, l, parsePower())
      case _ => done = true
    }
    l
  }
  private def parsePower(): Expr = {
    val base = parseUnary()
    if (isOp("**")) { advance(); BinOp("**", base, parseUnary()) } else base
  }
  private def parseUnary(): Expr =
    if (isOp("-")) { advance(); Unary("-", parseUnary()) }
    else if (isOp("+")) { advance(); parseUnary() }
    else parsePostfix()

  // ---- molecule with postfix table operators ------------------------------
  private def parsePostfix(): Expr = {
    var e = parseAtom()
    var done = false
    while (!done) {
      if (isOp(".")) {
        advance()
        val name = advance() match {
          case TIdent(v, _) => v
          case t => throw ParseError("expected attribute name", t.pos)
        }
        e = Attr(e, name)
      } else if (isOp("[")) {
        e = parseBracketPostfix(e)
      } else if (isOp("{")) {
        e = parseProjection(e)
      } else if (isIdent("order")) {
        advance(); expectOp("{")
        val keys = Seq.newBuilder[(Expr, Boolean)]
        var first = true
        while (!isOp("}")) {
          if (!first) expectOp(",")
          first = false
          if (isOp("^")) { advance(); keys += ((parseExpr(), false)) }
          else keys += ((parseExpr(), true))
        }
        expectOp("}")
        e = Order(e, keys.result())
      } else if (isIdent("update")) {
        advance(); expectOp("{")
        val fields = parseFields(stopAt = Set("}"))
        expectOp("}")
        e = Update(e, fields)
      } else if (isIdent("delete")) {
        advance(); expectOp("[")
        val conds = Seq.newBuilder[Expr]
        var first = true
        while (!isOp("]")) {
          if (!first) expectOp(",")
          first = false
          conds += parseExpr()
        }
        expectOp("]")
        e = Delete(e, conds.result())
      } else done = true
    }
    e
  }

  /** `t[...]` — slice if it contains `..`, else selection conditions. */
  private def parseBracketPostfix(t: Expr): Expr = {
    expectOp("[")
    if (isOp("..")) { // t[..n]
      advance()
      val until = parseExpr()
      expectOp("]")
      Slice(t, None, Some(until))
    } else {
      val first = parseExpr()
      if (isOp("..")) {
        advance()
        val until = if (isOp("]")) None else Some(parseExpr())
        expectOp("]")
        Slice(t, Some(first), until)
      } else {
        val conds = Seq.newBuilder[Expr]
        conds += first
        while (isOp(",")) { advance(); conds += parseExpr() }
        expectOp("]")
        Selection(t, conds.result())
      }
    }
  }

  private def parseFields(stopAt: Set[String]): Seq[Field] = {
    val fields = Seq.newBuilder[Field]
    var first = true
    while (!stopAt.exists(isOp)) {
      if (!first) expectOp(",")
      first = false
      // named field: IDENT ':' expr ; ellipsis: '...' ('!' IDENT)*
      if (isOp("...")) {
        advance()
        val ex = Seq.newBuilder[String]
        while (isOp("!")) {
          advance()
          ex += (advance() match {
            case TIdent(v, _) => v
            case t => throw ParseError("expected column name after '!'", t.pos)
          })
        }
        fields += Field(None, EllipsisE(ex.result()))
      } else (cur, toks.lift(p + 1)) match {
        case (TIdent(name, _), Some(TOp(":", _))) =>
          advance(); advance()
          fields += Field(Some(name), parseExpr())
        case _ =>
          fields += Field(None, parseExpr())
      }
    }
    fields.result()
  }

  private def parseProjection(t: Expr): Expr = {
    expectOp("{")
    if (isOp("=>")) { // {=> aggs}
      advance()
      val aggs = parseFields(stopAt = Set("}"))
      expectOp("}")
      Projection(t, Seq.empty, grouped = true, aggs)
    } else {
      val fields = parseFields(stopAt = Set("}", "=>"))
      if (isOp("=>")) {
        advance()
        val aggs = parseFields(stopAt = Set("}"))
        expectOp("}")
        Projection(t, fields, grouped = true, aggs)
      } else {
        expectOp("}")
        Projection(t, fields, grouped = false, Seq.empty)
      }
    }
  }

  private def parseAtom(): Expr = advance() match {
    case TInt(v, _) => IntLit(v)
    case TFloat(v, _) => FloatLit(v)
    case TStr(v, _) => StrLit(v)
    case TIdent("true", _) => BoolLit(true)
    case TIdent("false", _) => BoolLit(false)
    case TIdent("null", _) => NullLit
    case TIdent(name, _) =>
      if (isOp("(")) {
        advance()
        val args = Seq.newBuilder[Arg]
        var first = true
        while (!isOp(")")) {
          if (!first) expectOp(",")
          first = false
          (cur, toks.lift(p + 1)) match {
            case (TIdent(n2, _), Some(TOp(":", _))) =>
              advance(); advance()
              args += Arg(Some(n2), parseExpr())
            case _ => args += Arg(None, parseExpr())
          }
        }
        expectOp(")")
        Call(name, args.result())
      } else Ident(name)
    case TOp("(", _) =>
      val e = parseExpr()
      expectOp(")")
      e
    case TOp("[", _) =>
      if (isOp("..")) { // [..n] range from 0
        advance()
        val until = parseExpr()
        expectOp("]")
        RangeLit(None, Some(until))
      } else if (isOp("]")) { advance(); ListLit(Seq.empty) }
      else {
        val first = parseExpr()
        if (isOp("..")) {
          advance()
          val until = if (isOp("]")) None else Some(parseExpr())
          expectOp("]")
          RangeLit(Some(first), until)
        } else {
          val items = Seq.newBuilder[Expr]
          items += first
          while (isOp(",")) { advance(); items += parseExpr() }
          expectOp("]")
          ListLit(items.result())
        }
      }
    case t => throw ParseError(s"unexpected token $t", t.pos)
  }
}

object Parser {
  def parse(src: String): Ast.Program =
    new Parser(Lexer.lex(src)).parseProgram()
  def parseExpr(src: String): Ast.Expr =
    new Parser(Lexer.lex(src)).parseSingle()
}

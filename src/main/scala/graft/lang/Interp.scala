package graft.lang

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import graft.dsl.{NamedCol, PTable, Sort}
import graft.functions.PF
import graft.joins.Joins
import graft.types.{NameError, TypeError}

/** Interpreter for the reference-language front-end: evaluates parsed
  * programs against PTable values, so a user of the reference can run
  * queries in the original syntax on Spark:
  *
  *   Interp.run(spark, "customer{c_mktsegment => n: count()} order {^n}",
  *     "customer" -> customerTable)
  *
  * Table operators compile to the graft DSL (hence plain Catalyst
  * plans); nothing is interpreted row-by-row.
  *
  * Supported: projections (incl. ellipsis/exclusions and all three
  * group-by forms), selections (incl. `in`/`!in` against tables →
  * semi/anti joins), slices, order, update/delete, joins (auto-join
  * via FK metadata, explicit `on:`), ranges, list literals, the full
  * operator ladder with the reference's semantics (`/` float, `/~`
  * floor, null-safe `==`, `~` like), and the §2 function library.
  */
object Interp {
  import Ast._

  def run(spark: SparkSession, src: String, tables: (String, PTable)*): PTable = {
    val prog = Parser.parse(src)
    var env: Map[String, PTable] = tables.toMap
    var funcs: Map[String, FuncDef] = Map.empty
    prog.stmts.foreach {
      case Assign(name, value) =>
        env = env + (name ->
          evalTable(spark, inline(value, funcs), env).named(name))
      case fd: FuncDef =>
        funcs = funcs + (fd.name -> fd)
      case InsertRows(name, value) =>
        val base = env.getOrElse(name,
          throw new NameError(s"unknown table '$name'"))
        val rows = evalTable(spark, inline(value, funcs), env)
        env = env + (name -> graft.dsl.PTable(
          base.df.unionByName(rows.df, allowMissingColumns = true),
          base.meta))
      case NewRow(name, args) =>
        val base = env.getOrElse(name,
          throw new NameError(s"unknown table '$name'"))
        val cat = new graft.catalog.Catalog(spark)
        cat.register(name, base)
        cat.insertRow(name, args.map { a =>
          a.name.getOrElse(throw new TypeError(
            "new Table(...) requires named arguments")) -> litAny(a.value)
        }.toMap)
        env = env + (name -> cat.get(name))
    }
    evalTable(spark, inline(prog.result, funcs), env)
  }

  /** Inline user function calls by AST substitution — the engine's
    * version of the reference's compile-and-inline for vectorizable
    * functions (reference evaluate.py:551-648): the body is spliced
    * into the call site with parameters replaced by argument ASTs, so
    * `func sqsum(x) = sum(x*x)` works inside aggregation projections
    * at zero runtime cost.
    */
  private def inline(e: Expr, funcs: Map[String, FuncDef]): Expr = {
    def subst(body: Expr, bind: Map[String, Expr]): Expr = rewrite(body) {
      case Ident(n) if bind.contains(n) => bind(n)
    }
    rewrite(e) {
      case Call(fn, args) if funcs.contains(fn) =>
        val fd = funcs(fn)
        if (args.length != fd.params.length)
          throw new TypeError(
            s"${fn} expects ${fd.params.length} argument(s), got ${args.length}")
        if (args.exists(_.name.isDefined))
          throw new TypeError(s"positional arguments only for user func $fn")
        val bind = fd.params.zip(args.map(a => inline(a.value, funcs))).toMap
        inline(subst(fd.body, bind), funcs)
    }
  }

  /** Bottom-up AST rewrite with a partial function applied post-order. */
  private def rewrite(e: Expr)(pf: PartialFunction[Expr, Expr]): Expr = {
    val mapped = e match {
      case BinOp(op, l, r) => BinOp(op, rewrite(l)(pf), rewrite(r)(pf))
      case Unary(op, x) => Unary(op, rewrite(x)(pf))
      case Attr(o, n) => Attr(rewrite(o)(pf), n)
      case Call(fn, args) =>
        Call(fn, args.map(a => Arg(a.name, rewrite(a.value)(pf))))
      case ListLit(items) => ListLit(items.map(rewrite(_)(pf)))
      case Selection(t, cs) => Selection(rewrite(t)(pf), cs.map(rewrite(_)(pf)))
      case Slice(t, f, u) =>
        Slice(rewrite(t)(pf), f.map(rewrite(_)(pf)), u.map(rewrite(_)(pf)))
      case Projection(t, fs, g, as) =>
        Projection(rewrite(t)(pf),
          fs.map(f => Field(f.name, rewrite(f.value)(pf))), g,
          as.map(f => Field(f.name, rewrite(f.value)(pf))))
      case Order(t, ks) =>
        Order(rewrite(t)(pf), ks.map { case (k, asc) => (rewrite(k)(pf), asc) })
      case Update(t, fs) =>
        Update(rewrite(t)(pf), fs.map(f => Field(f.name, rewrite(f.value)(pf))))
      case Delete(t, cs) => Delete(rewrite(t)(pf), cs.map(rewrite(_)(pf)))
      case RangeLit(f, u) =>
        RangeLit(f.map(rewrite(_)(pf)), u.map(rewrite(_)(pf)))
      case leaf => leaf
    }
    if (pf.isDefinedAt(mapped)) pf(mapped) else mapped
  }

  // ---- table evaluation ---------------------------------------------------
  def evalTable(spark: SparkSession, e: Expr, env: Map[String, PTable]): PTable = {
    def t(ex: Expr): PTable = evalTable(spark, ex, env)
    e match {
      case Ident(name) =>
        env.getOrElse(name, throw new NameError(s"unknown table '$name'"))

      case Selection(te, conds) =>
        // `x in other` / `x !in other` conditions become semi/anti joins
        conds.foldLeft(t(te)) { (acc, cond) =>
          cond match {
            case BinOp("in", l, r) if isTableExpr(r, env) =>
              semiAnti(acc, l, t(r), anti = false)
            case BinOp("!in", l, r) if isTableExpr(r, env) =>
              semiAnti(acc, l, t(r), anti = true)
            case c => acc.where(evalCol(c))
          }
        }

      case Slice(te, from, until) =>
        val f = from.map(constInt).getOrElse(0L).toInt
        val u = until.map(constInt).map(_.toInt)
        u match {
          case Some(end) => t(te).slice(f, end)
          case None => // t[n..] — drop first n
            val tt = t(te)
            graft.dsl.PTable(tt.df.offset(f), tt.meta)
        }

      case Projection(te, fields, grouped, aggs) =>
        val tab = t(te)
        if (!grouped) tab.project(expandFields(tab, fields): _*)
        else if (fields.isEmpty) tab.aggAll(namedAggs(aggs): _*)
        else if (aggs.isEmpty) tab.groupBy(expandFields(tab, fields): _*)()
        else tab.groupBy(expandFields(tab, fields): _*)(namedAggs(aggs): _*)

      case Order(te, keys) =>
        t(te).orderBy(keys.map { case (k, asc) => Sort(evalCol(k), asc) }: _*)

      case Update(te, fields) =>
        // bare `t update {...}` updates all rows; pair with a prior
        // Selection for conditional update — matches reference shape
        // `t[conds] update {...}` only when t is a Selection node
        te match {
          case Selection(base, conds) =>
            val cond = conds.map(c => evalCol(c)).reduce(_ && _)
            t(base).update(cond)(fields.map(f =>
              f.name.getOrElse(fieldName(f)) -> evalCol(f.value)): _*)
          case _ =>
            t(te).update(lit(true))(fields.map(f =>
              f.name.getOrElse(fieldName(f)) -> evalCol(f.value)): _*)
        }

      case Delete(te, conds) =>
        t(te).delete(conds.map(c => evalCol(c)).reduce(_ && _))

      case RangeLit(from, until) =>
        val f = from.map(constInt).getOrElse(0L)
        val u = until.getOrElse(
          throw new TypeError("unbounded range not supported")) match {
          case e2 => constInt(e2)
        }
        PTable.range(spark, f, u)

      case ListLit(items) if items.nonEmpty =>
        items.head match {
          case _: IntLit => PTable.fromList(spark,
            items.map { case IntLit(v) => v
                        case o => throw new TypeError(s"mixed-type list: $o") })
          case _: StrLit => PTable.fromList(spark,
            items.map { case StrLit(v) => v
                        case o => throw new TypeError(s"mixed-type list: $o") })
          case _: FloatLit => PTable.fromList(spark,
            items.map { case FloatLit(v) => v
                        case o => throw new TypeError(s"mixed-type list: $o") })
          case o => throw new TypeError(s"unsupported list element: $o")
        }

      case Call(fn, args) => tableCall(spark, fn, args, env)

      case other => throw new TypeError(s"not a table expression: $other")
    }
  }

  private def isTableExpr(e: Expr, env: Map[String, PTable]): Boolean = e match {
    case Ident(n) => env.contains(n)
    case _: Projection | _: Selection | _: RangeLit | _: ListLit |
         _: Order | _: Slice => true
    case _ => false
  }

  private def semiAnti(acc: PTable, l: Expr, other: PTable, anti: Boolean): PTable = {
    val leftCol = l match {
      case Ident(n) => n
      case Attr(_, n) => n
      case o => throw new TypeError(s"'in' left side must be a column, got $o")
    }
    val rightCol = other.columns.head
    if (anti) Joins.anti(acc, leftCol, other, rightCol)
    else Joins.semi(acc, leftCol, other, rightCol)
  }

  private def tableCall(spark: SparkSession, fn: String, args: Seq[Arg],
                        env: Map[String, PTable]): PTable = {
    def t(e: Expr): PTable = evalTable(spark, e, env)
    fn match {
      case "join" | "leftjoin" | "outerjoin" | "joinall" =>
        val on = args.find(_.name.contains("on")).map(a => evalCol(a.value))
        val sides = args.filterNot(_.name.contains("on")).map { a =>
          val alias = a.name.getOrElse(
            throw new TypeError("join sides must be named: join(a: t1, b: t2)"))
          alias -> t(a.value)
        }
        val kind = fn match {
          case "join" => Joins.Inner
          case "leftjoin" => Joins.LeftOuter
          case "outerjoin" => Joins.FullOuter
          case "joinall" => Joins.Cross
        }
        Joins.joinN(kind, sides.map(Joins.Side(_)), on)
      case "distinct" => t(args.head.value).distinct
      case "limit" =>
        t(args.head.value).limit(constInt(args(1).value).toInt)
      case "enum" => t(args.head.value).enum("index")
      case "count" => // count(table) → one-row table
        t(args.head.value).aggAll(NamedCol("count", F.count(lit(1))))
      case "bfs" =>
        PTable(graft.rec.Graph.bfs(t(args.head.value).df, t(args(1).value).df))
      case "walk_tree" =>
        PTable(graft.rec.Graph.walkTree(t(args.head.value).df,
          t(args(1).value).df, constInt(args(2).value).toInt))
      case other => throw new NameError(s"unknown table function '$other'")
    }
  }

  private def constInt(e: Expr): Long = e match {
    case IntLit(v) => v
    case Unary("-", IntLit(v)) => -v
    case o => throw new TypeError(s"expected integer literal, got $o")
  }

  // ---- projection fields --------------------------------------------------
  private def fieldName(f: Field): String = f.value match {
    case Ident(n) => n
    case Attr(_, n) => n
    case Call(fn, _) => fn
    case _ => f.name.getOrElse(
      throw new TypeError(s"computed field needs a name: ${f.value}"))
  }

  private def expandFields(tab: PTable, fields: Seq[Field]): Seq[NamedCol] =
    fields.flatMap { f =>
      f.value match {
        case EllipsisE(excludes) =>
          val explicit = fields.collect {
            case Field(Some(n), _) => n
            case Field(None, Ident(n)) => n
          }.toSet
          tab.columns
            .filterNot(c => excludes.contains(c) || explicit.contains(c))
            .map(c => NamedCol(c, col(c)))
        case v => Seq(NamedCol(f.name.getOrElse(fieldName(f)), evalCol(v)))
      }
    }

  private def namedAggs(aggs: Seq[Field]): Seq[NamedCol] =
    aggs.map { f =>
      f.value match {
        // bare column in agg scope collects into an array
        // (reference compiler.py:59-63)
        case Ident(n) if !f.name.isDefined =>
          NamedCol(n, F.collect_list(col(n)))
        case v => NamedCol(f.name.getOrElse(fieldName(f)), evalCol(v, agg = true))
      }
    }

  // ---- column evaluation --------------------------------------------------
  def evalCol(e: Expr, agg: Boolean = false): Column = e match {
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StrLit(v) => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)
    case Ident(n) => col(n)
    case Attr(o, n) => col(attrPath(Attr(o, n)))
    case Unary("-", x) => -evalCol(x, agg)
    case Unary("not", x) => !evalCol(x, agg)
    case BinOp(op, l, r) => binop(op, l, r, agg)
    case Call(fn, args) => colCall(fn, args, agg)
    case o => throw new TypeError(s"not a column expression: $o")
  }

  private def attrPath(e: Expr): String = e match {
    case Ident(n) => n
    case Attr(o, n) => s"${attrPath(o)}.$n"
    case o => throw new TypeError(s"bad attribute path: $o")
  }

  private def binop(op: String, le: Expr, re: Expr, agg: Boolean): Column = {
    lazy val l = evalCol(le, agg)
    lazy val r = evalCol(re, agg)
    op match {
      case "==" => PF.eq(l, r)
      case "!=" | "<>" => PF.neq(l, r)
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
      case "~" => l.like(litString(re))
      case "and" => l && r
      case "or" => l || r
      case "+" => (le, re) match {
        // string + is concatenation (reference compile_binops.py:201)
        case (StrLit(_), _) | (_, StrLit(_)) => F.concat(l, r)
        case _ => l + r
      }
      case "-" => l - r
      case "*" => (le, re) match {
        // string * n is repetition
        case (StrLit(_), _) => PF.strRepeat(l, r)
        case _ => l * r
      }
      case "/" => PF.div(l, r)
      case "/~" => PF.floorDiv(l, r)
      case "%" => l % r
      case "**" => PF.pow(l, r)
      case "in" => re match {
        case ListLit(items) => l.isin(items.map(litValue): _*)
        case StrLit(s) => PF.strContains(lit(s), l) // "x" in "text"
        case _ => throw new TypeError(
          "'in' against a table is only supported as a selection condition")
      }
      case "!in" => re match {
        case ListLit(items) => !l.isin(items.map(litValue): _*)
        case StrLit(s) => !PF.strContains(lit(s), l)
        case _ => throw new TypeError(
          "'!in' against a table is only supported as a selection condition")
      }
      case o => throw new TypeError(s"unknown operator '$o'")
    }
  }

  private def litString(e: Expr): String = e match {
    case StrLit(s) => s
    case o => throw new TypeError(s"expected string literal, got $o")
  }

  private def litAny(e: Expr): Any = e match {
    case IntLit(v) => v
    case FloatLit(v) => v
    case StrLit(v) => v
    case BoolLit(v) => v
    case NullLit => null
    case Unary("-", IntLit(v)) => -v
    case o => throw new TypeError(s"'new' values must be literals, got $o")
  }

  private def litValue(e: Expr): Any = e match {
    case IntLit(v) => v
    case FloatLit(v) => v
    case StrLit(v) => v
    case BoolLit(v) => v
    case o => throw new TypeError(s"expected literal, got $o")
  }

  private def colCall(fn: String, args: Seq[Arg], agg: Boolean): Column = {
    def a(i: Int): Column = evalCol(args(i).value, agg)
    def arity(n: Int): Unit =
      if (args.length != n)
        throw new TypeError(s"$fn expects $n argument(s), got ${args.length}")
    fn match {
      // aggregates
      case "count" =>
        if (args.isEmpty) F.count(lit(1)) else { arity(1); F.count(a(0)) }
      case "sum" => arity(1); F.sum(a(0))
      case "min" => arity(1); F.min(a(0))
      case "max" => arity(1); F.max(a(0))
      case "mean" | "avg" => arity(1); F.avg(a(0))
      case "stddev" => arity(1); F.stddev_samp(a(0))
      case "count_distinct" => arity(1); F.countDistinct(a(0))
      case "count_true" => arity(1); PF.countTrue(a(0))
      case "count_false" => arity(1); PF.countFalse(a(0))
      case "first" => arity(1); F.first(a(0))
      case "product" => arity(1); PF.product(a(0).cast(DoubleType))
      case "approx_product" => arity(1); PF.approxProduct(a(0))
      case "median" => arity(1); F.percentile(a(0), lit(0.5))
      // scalar functions
      case "upper" => arity(1); F.upper(a(0))
      case "lower" => arity(1); F.lower(a(0))
      case "length" => arity(1); F.length(a(0))
      case "round" =>
        if (args.length == 1) F.round(a(0), 0)
        else { arity(2); F.round(a(0), constInt(args(1).value).toInt) }
      case "repeat" => arity(2); PF.strRepeat(a(0), a(1))
      case "char" => arity(1); PF.charOf(a(0))
      case "char_ord" => arity(1); PF.charOrd(a(0))
      case "str_index" => arity(2); PF.strIndex(a(1), a(0))
      case "str_contains" => arity(2); PF.strContains(a(1), a(0))
      case "year" => arity(1); PF.year(a(0))
      case "month" => arity(1); PF.month(a(0))
      case "day" => arity(1); PF.day(a(0))
      case "hour" => arity(1); PF.hour(a(0))
      case "minute" => arity(1); PF.minute(a(0))
      case "day_of_week" => arity(1); PF.dayOfWeek(a(0))
      case "week_of_year" => arity(1); PF.weekOfYear(a(0))
      // conditional expression (reference ast.If → sql.Case,
      // compiler.py:172-181)
      case "iif" => arity(3); F.when(a(0), a(1)).otherwise(a(2))
      case "pi" => lit(math.Pi)
      case "now" => F.current_timestamp()
      case "random" => F.rand()
      // casts (type-as-function, reference evaluate.py:560-563)
      case "int" => arity(1); args.head.value match {
        case StrLit(_) => PF.strictToInt(a(0))
        case _ => a(0).cast(LongType)
      }
      case "float" => arity(1); a(0).cast(DoubleType)
      case "string" => arity(1); a(0).cast(StringType)
      case "bool" => arity(1); PF.numToBool(a(0))
      case other => throw new NameError(s"unknown function '$other'")
    }
  }
}

package graft.osl

import Ast._
import Lexer._

/** Recursive-descent / Pratt parser for OSL.
  *
  * Grammar per `/root/reference/docs/osl/language_reference.md`: optional
  * `select … end` / `sort … end` sections followed by statements; blocks
  * (`if`, `for/in`, `each_row … where`) close with `end`; `@segment`
  * headers split multi-segment scripts. Original implementation (the
  * reference compiles to stack-machine opcodes; we build a typed AST).
  */
final class Parser(toks: Vector[Tok]) {
  private var pos = 0

  private def peek: Tok = toks(pos)
  private def peekIs(op: String): Boolean = peek match {
    case TOp(o) => o == op
    case _ => false
  }
  private def peekIdent: Option[String] = peek match {
    case TIdent(s) => Some(s)
    case _ => None
  }
  private def next(): Tok = { val t = toks(pos); pos += 1; t }
  private def expectOp(op: String): Unit = next() match {
    case TOp(o) if o == op => ()
    case t => fail(s"expected '$op' got '${t.text}'")
  }
  private def expectIdent(): String = next() match {
    case TIdent(s) => s
    case t => fail(s"expected identifier got '${t.text}'")
  }
  private def skipNewlines(): Unit = while (peek == TNewline) pos += 1
  private def endOfStmt(): Unit = {
    if (peekIs(":")) next() // tolerate trailing colon (docs show both styles)
    peek match {
      case TNewline => next()
      case TEof => ()
      case t => fail(s"expected end of line, got '${t.text}'")
    }
  }
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"OSL parse error @$pos: $msg")

  // ----------------------------------------------------------- entry points
  def parseProgram(): Program = {
    skipNewlines()
    var select: Seq[SelectCol] = Nil
    if (peekIdent.contains("select") || peekIdent.contains("agg")) {
      next(); endOfStmt()
      select = parseSelectBody()
    }
    skipNewlines()
    var sort: Seq[SortSpec] = Nil
    if (peekIdent.contains("sort")) {
      next(); endOfStmt()
      val specs = Seq.newBuilder[SortSpec]
      skipNewlines()
      while (!peekIdent.contains("end")) {
        val colName = expectIdent()
        val asc = peekIdent match {
          case Some("asc")  => next(); true
          case Some("desc") => next(); false
          case _            => false // reference default: descending
        }
        endOfStmt()
        specs += SortSpec(colName, asc)
        skipNewlines()
      }
      next(); endOfStmt()
      sort = specs.result()
    }
    val code = parseBlock(topLevel = true)
    Program(select, code, sort)
  }

  def parseSegments(): Seq[SegmentDef] = {
    skipNewlines()
    val defs = Seq.newBuilder[SegmentDef]
    while (peek != TEof) {
      if (!peekIs("@")) fail(s"expected @segment, got '${peek.text}'")
      next()
      val kw = expectIdent()
      if (kw != "segment") fail(s"expected 'segment' after '@', got '$kw'")
      val name = expectIdent()
      var flags = Map.empty[String, String]
      while (peek != TNewline && peek != TEof) {
        val k = expectIdent()
        expectOp("=")
        val v = next() match {
          case TIdent(s) => s
          case TInt(i) => i.toString
          case TTime(ms) => s"${ms}ms" // explicit unit: lexed from a time literal
          case TDbl(d) => d.toString
          case TStr(s) => s
          case t => fail(s"bad flag value '${t.text}'")
        }
        flags += (k -> v)
      }
      endOfStmt()
      val body = parseBlock(topLevel = true, stopAtSegment = true)
      defs += SegmentDef(name, flags, body)
      skipNewlines()
    }
    defs.result()
  }

  // ------------------------------------------------------------------ select
  private def parseSelectBody(): Seq[SelectCol] = {
    val cols = Seq.newBuilder[SelectCol]
    skipNewlines()
    while (!peekIdent.contains("end")) {
      val agg = expectIdent()
      if (!Set("count", "sum", "min", "max", "avg", "value", "var").contains(agg))
        fail(s"unknown aggregator '$agg'")
      val prop = expectIdent()
      var alias = prop
      var withKey: Option[String] = None
      var all = false
      var done = false
      while (!done) peekIdent match {
        case Some("as")   => next(); alias = expectIdent()
        case Some("with") => next(); withKey = Some(expectIdent())
        case Some("all")  => next(); all = true
        case _            => done = true
      }
      endOfStmt()
      cols += SelectCol(agg, prop, alias, withKey, all)
      skipNewlines()
    }
    next() // end
    endOfStmt()
    cols.result()
  }

  // -------------------------------------------------------------- statements
  /** Parse statements until `end` (or EOF / next @segment at top level). */
  private def parseBlock(topLevel: Boolean = false,
                         stopAtSegment: Boolean = false): Seq[Stmt] = {
    val stmts = Seq.newBuilder[Stmt]
    skipNewlines()
    var done = false
    while (!done) {
      if (peek == TEof) {
        if (!topLevel) fail("unexpected EOF inside block")
        done = true
      } else if (stopAtSegment && peekIs("@")) {
        done = true
      } else if (peekIdent.contains("end")) {
        if (topLevel && !stopAtSegment) fail("unmatched 'end'")
        if (!topLevel) { next(); endOfStmt() }
        else { next(); endOfStmt() } // tolerate stray end before @segment
        done = true
      } else if (peekIdent.contains("else")) {
        done = true // handled by caller (if)
      } else {
        stmts += parseStmt()
        skipNewlines()
      }
    }
    stmts.result()
  }

  private def parseStmt(): Stmt = {
    peek match {
      case TOp("<<") =>
        next()
        val groups = Seq.newBuilder[Expr]
        groups += parseExpr()
        while (peekIs(",")) { next(); groups += parseExpr() }
        endOfStmt()
        Tally(groups.result())

      case TIdent("if") =>
        next()
        parseIfRest()

      case TIdent("for") =>
        next()
        val v = expectIdent()
        val kw = expectIdent()
        if (kw != "in") fail("expected 'in' in for loop")
        val it = parseExpr()
        endOfStmt()
        val body = parseBlock()
        ForIn(v, it, body)

      case TIdent("each_row") =>
        next()
        val mods = parseEachRowMods()
        val kw = expectIdent()
        if (kw != "where") fail("each_row requires 'where'")
        val where = parseExpr()
        endOfStmt()
        val body = parseBlock()
        EachRow(mods, where, body)

      case TIdent("return") =>
        next()
        val v = if (peekIs("(")) {
          next()
          val e = parseExpr()
          expectOp(")")
          Some(e)
        } else peek match {
          case TNewline | TEof => None
          case _ => Some(parseExpr()) // tolerate unparenthesized return
        }
        endOfStmt()
        Return(v)

      case TIdent("break") =>
        next()
        var depth = 1
        var all = false
        var top = false
        if (peekIs("(")) {
          next()
          next() match {
            case TInt(i) => depth = i.toInt
            case TStr("all") => all = true
            case TStr("top") => top = true
            case t => fail(s"bad break argument '${t.text}'")
          }
          expectOp(")")
        }
        endOfStmt()
        Break(depth, all, top)

      case TIdent("continue") =>
        next(); endOfStmt(); ContinueStmt

      case TIdent("exit") =>
        next(); endOfStmt(); ExitStmt

      case _ =>
        // assignment or bare expression
        val e = parseExpr()
        peek match {
          case TOp("=") | TOp("+=") | TOp("-=") =>
            val op = next().text
            val rhs = parseExpr()
            endOfStmt()
            e match {
              case VarRef(_) | PropRef(_) | Subscript(_, _) => Assign(e, op, rhs)
              case _ => fail("invalid assignment target")
            }
          case _ =>
            endOfStmt()
            ExprStmt(e)
        }
    }
  }

  /** Parse the remainder of an `if` after the keyword: condition, body,
    * optional `else` / `else if` chain. The closing `end` of the whole chain
    * is consumed exactly once. */
  private def parseIfRest(): Stmt = {
    val cond = parseExpr()
    endOfStmt()
    val body = parseBlock()
    if (peekIdent.contains("else")) {
      next()
      if (peekIdent.contains("if")) {
        next()
        If(cond, body, Seq(parseIfRest()))
      } else {
        endOfStmt()
        val elseBody = parseBlock()
        If(cond, body, elseBody)
      }
    } else If(cond, body, Nil)
  }

  private def parseEachRowMods(): EachRowMods = {
    var m = EachRowMods()
    while (peekIs(".")) {
      next()
      val name = expectIdent()
      expectOp("(")
      val args = Seq.newBuilder[Expr]
      if (!peekIs(")")) {
        args += parseExpr()
        while (peekIs(",")) { next(); args += parseExpr() }
      }
      expectOp(")")
      val a = args.result()
      name match {
        case "reverse"    => m = m.copy(reverse = true)
        case "forward"    => m = m.copy(reverse = false)
        case "continue"   => m = m.copy(continueFrom = true)
        case "next"       => m = m.copy(next = true)
        case "from"       => m = m.copy(from = Some(a.head))
        case "limit"      => m = m.copy(limit = Some(a.head))
        case "within"     => m = m.copy(frame = Some(Within(a(0), if (a.size > 1) a(1) else VarRefNow)))
        case "look_ahead" => m = m.copy(frame = Some(LookAhead(a(0), a.lift(1))))
        case "look_back"  => m = m.copy(frame = Some(LookBack(a(0), a.lift(1))))
        case "range"      => m = m.copy(frame = Some(DateRange(a(0), a(1))))
        case other        => fail(s"unknown each_row modifier '$other'")
      }
    }
    m
  }

  private val VarRefNow = VarRef("now")

  // ------------------------------------------------------------- expressions
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (peekIs("||")) { next(); l = BinOp("||", l, parseAnd()) }
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (peekIs("&&")) { next(); l = BinOp("&&", l, parseNot()) }
    l
  }
  private def parseNot(): Expr =
    if (peekIs("!")) { next(); UnOp("!", parseNot()) }
    else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAdditive()
    var done = false
    while (!done) {
      peek match {
        case TOp(o) if Set("==", "!=", ">", ">=", "<", "<=").contains(o) =>
          next(); l = BinOp(o, l, parseAdditive())
        case TIdent("in") =>
          next(); l = BinOp("in", l, parseAdditive())
        case TIdent("contains") =>
          next(); l = BinOp("contains", l, parseAdditive())
        case TIdent("any") =>
          next(); l = BinOp("any", l, parseAdditive())
        case _ => done = true
      }
    }
    l
  }
  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var done = false
    while (!done) peek match {
      case TOp("+") => next(); l = BinOp("+", l, parseMultiplicative())
      case TOp("-") => next(); l = BinOp("-", l, parseMultiplicative())
      case _ => done = true
    }
    l
  }
  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    var done = false
    while (!done) peek match {
      case TOp("*") => next(); l = BinOp("*", l, parseUnary())
      case TOp("/") => next(); l = BinOp("/", l, parseUnary())
      case _ => done = true
    }
    l
  }
  private def parseUnary(): Expr = peek match {
    case TOp("-") => next(); UnOp("-", parseUnary())
    case _ => parsePostfix()
  }

  private val aggKinds = Set("sum", "count", "dcount", "min", "max", "avg", "test", "row")
  private val testKinds = Set("is", "is_not", "ever", "never")
  private val frameMods = Set("within", "look_ahead", "look_back", "range", "next", "reverse")

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var done = false
    // accumulated filter-chain state (for PropTest / InlineAgg)
    var frame: Option[Frame] = None
    var nextFlag = false
    var reverseFlag = false

    while (!done) {
      peek match {
        case TOp("[") =>
          next()
          val idx = parseExpr()
          expectOp("]")
          e = Subscript(e, idx)
        case TOp(".") =>
          next()
          val name = expectIdent()
          if (testKinds.contains(name)) {
            expectOp("(")
            val cmp = parseComparator()
            expectOp(")")
            val propName = e match {
              case PropRef(p) => p
              case VarRef(p)  => p
              case _ => fail(s"filter chain '.$name' requires a property")
            }
            e = PropTest(propName, name, cmp, frame, nextFlag)
            frame = None; nextFlag = false
          } else if (frameMods.contains(name)) {
            expectOp("(")
            val args = Seq.newBuilder[Expr]
            if (!peekIs(")")) {
              args += parseExpr()
              while (peekIs(",")) { next(); args += parseExpr() }
            }
            expectOp(")")
            val a = args.result()
            name match {
              case "within"     => frame = Some(Within(a(0), if (a.size > 1) a(1) else VarRef("now")))
              case "look_ahead" => frame = Some(LookAhead(a.headOption.getOrElse(Lit(VInt(Long.MaxValue))), a.lift(1)))
              case "look_back"  => frame = Some(LookBack(a.headOption.getOrElse(Lit(VInt(Long.MaxValue))), a.lift(1)))
              case "range"      => frame = Some(DateRange(a(0), a(1)))
              case "next"       => nextFlag = true
              case "reverse"    => reverseFlag = true
            }
          } else {
            // generic method call: s.split(','), d.pop() …
            if (peekIs("(")) {
              next()
              val args = Seq.newBuilder[Expr]
              if (!peekIs(")")) {
                args += parseExpr()
                while (peekIs(",")) { next(); args += parseExpr() }
              }
              expectOp(")")
              e = MethodCall(e, name, args.result())
            } else e = MethodCall(e, name, Nil)
          }
        case TIdent("where") =>
          // inline aggregation: sum(x).within(...) where cond
          next()
          val whereExpr = parseExpr()
          val (kind, arg) = e match {
            case Call(n, as) if aggKinds.contains(n) => (n, as.headOption)
            case VarRef(n) if aggKinds.contains(n)   => (n, None)
            case PropRef(n) if aggKinds.contains(n)  => (n, None)
            case _ => fail("'where' follows only inline aggregations")
          }
          e = InlineAgg(kind, arg, frame, reverseFlag, whereExpr)
          frame = None; reverseFlag = false
          done = true
        case _ => done = true
      }
    }
    e
  }

  private def parseComparator(): Comparator = peek match {
    case TOp(o) if Set("==", "!=", ">", ">=", "<", "<=").contains(o) =>
      next(); Comparator(o, parseExpr())
    case TIdent("in") => next(); Comparator("in", parseExpr())
    case TIdent("contains") => next(); Comparator("contains", parseExpr())
    case TIdent("any") => next(); Comparator("any", parseExpr())
    case _ => Comparator("truthy", parseExpr())
  }

  private def parsePrimary(): Expr = next() match {
    case TInt(i) => Lit(VInt(i))
    case TTime(ms) => Lit(VInt(ms))
    case TDbl(d) => Lit(VDbl(d))
    case TStr(s) => Lit(VStr(s))
    case TIdent("true") => Lit(VBool(true))
    case TIdent("false") => Lit(VBool(false))
    case TIdent("nil") | TIdent("None") => Lit(VNone)
    case TIdent(name) =>
      if (peekIs("(")) {
        next()
        val args = Seq.newBuilder[Expr]
        if (!peekIs(")")) {
          args += parseExpr()
          while (peekIs(",")) { next(); args += parseExpr() }
        }
        expectOp(")")
        Call(name, args.result())
      } else VarRef(name)
    case TOp("(") =>
      val e = parseExpr()
      expectOp(")")
      e
    case TOp("[") =>
      val items = Seq.newBuilder[Expr]
      skipNewlines()
      if (!peekIs("]")) {
        items += parseExpr()
        while (peekIs(",")) { next(); skipNewlines(); items += parseExpr() }
      }
      skipNewlines()
      expectOp("]")
      ListLit(items.result())
    case TOp("{") =>
      val pairs = Seq.newBuilder[(Expr, Expr)]
      skipNewlines()
      if (!peekIs("}")) {
        def pair(): Unit = {
          val k = parseExpr()
          expectOp(":")
          skipNewlines()
          val v = parseExpr()
          pairs += ((k, v))
        }
        pair()
        while (peekIs(",")) { next(); skipNewlines(); pair() }
      }
      skipNewlines()
      expectOp("}")
      DictLit(pairs.result())
    case t => fail(s"unexpected token '${t.text}'")
  }
}

object Parser {
  def program(src: String): Ast.Program =
    new Parser(Lexer.lex(src)).parseProgram()

  def segments(src: String): Seq[Ast.SegmentDef] =
    new Parser(Lexer.lex(src)).parseSegments()
}

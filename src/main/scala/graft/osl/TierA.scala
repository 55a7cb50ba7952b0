package graft.osl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import Ast._

/** Tier A: compile declarative OSL scripts straight to Catalyst plans
  * (SURVEY §7.2 M2 — capability detection mirroring the reference's
  * `Macro_s` flags).
  *
  * Compilable shape: an optional `select` section plus exactly one
  * un-modified `each_row where <row-predicate>` whose body is a single
  * tally. That covers the reference's bread-and-butter queries
  * (README.md:152-196) and runs fully codegen'd — filter pushdown, partial
  * aggregation, no per-customer interpretation. Everything else returns
  * None and runs through the Tier B interpreter with identical semantics
  * (spec-enforced).
  *
  * Output schema/values match `OslEngine.query` exactly: `(depth, g1..g8,
  * <aliases>)`, group keys canonicalized like the interpreter, sums through
  * DECIMAL(28,4) (= the interpreter's ×10,000 fixed point).
  */
object TierA {

  def compile(program: Program, events: DataFrame, now: Long,
              sessionGapMs: Long): Option[DataFrame] = {
    val selects =
      (if (program.select.nonEmpty) program.select
       else Seq(SelectCol("count", "id", "id", None, all = false))).toVector

    program.code match {
      case Seq(EachRow(mods, where, Seq(Tally(groups)))) if isDefault(mods) =>
        for {
          pred <- compileExpr(where, now)
          gCols <- traverse(groups.map(g => compileExpr(g, now)))
          aggs <- traverse(selects.map(compileAgg))
          if groups.nonEmpty && groups.size <= OslEngine.MaxDepth
        } yield {
          val needsSession = Interpreter.referencesSession(program)
          val base0 = if (needsSession)
            graft.operators.EventOps.sessionize(events, sessionGapMs)
          else events
          val filtered = base0.where(pred)
          val d = gCols.length
          val withG = gCols.zipWithIndex.foldLeft(filtered) { case (df, (g, i)) =>
            df.withColumn(s"g${i + 1}", canonKey(filtered, g))
          }
          val gNames = (1 to d).map(i => col(s"g$i"))
          val gid = grouping_id(gNames: _*)
          val rolled = withG.rollup(gNames: _*)
            .agg(aggs.head._2.as(aggs.head._1),
              (aggs.tail.map { case (n, c) => c.as(n) } :+ gid.as("__gid")): _*)
          // grouping_id bit i set = column i grouped OUT; tally nodes are the
          // contiguous prefixes (gid = 0, 1, 3, 7, …); the grand total (all
          // out) has no tally equivalent (src/queryinterpreter.cpp:324-333).
          val depth = (lit(d) - expr("bit_count(__gid)")).cast("int").as("depth")
          val padded = (d + 1 to OslEngine.MaxDepth).map(i =>
            lit(null).cast("string").as(s"g$i"))
          // rollup only generates prefix groupings; drop the grand total,
          // which has no tally-tree equivalent
          rolled
            .where(col("__gid") =!= ((1 << d) - 1))
            .select((depth +: gNames) ++ padded ++ selects.map(s => col(s.alias)): _*)
        }
      case _ => None
    }
  }

  private def isDefault(m: EachRowMods): Boolean =
    !m.reverse && !m.continueFrom && !m.next &&
      m.from.isEmpty && m.limit.isEmpty && m.frame.isEmpty

  private def traverse[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Canonical group-key string, matching Interpreter.canonKey: integral
    * doubles render without a decimal point. The rewrite applies only to
    * NUMERIC-typed keys — Interpreter.canonKey rewrites VDbl only, so string
    * keys ('007', ' 7', '1e3') must pass through verbatim in both tiers. */
  private def canonKey(df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    val numeric = df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    if (!numeric) c.cast("string")
    else {
      val asD = c.cast("double")
      when(c.isNull, lit(null).cast("string"))
        .when(asD === floor(asD) && abs(asD) < 1e15,
          asD.cast("long").cast("string"))
        .otherwise(c.cast("string"))
    }
  }

  private def compileAgg(s: SelectCol): Option[(String, Column)] = s.agg match {
    case "count" if s.prop == "id" && s.withKey.isEmpty =>
      Some(s.alias -> countDistinct(col("id")))
    case "count" if s.prop == "id" =>
      Some(s.alias -> countDistinct(col(s.withKey.get)))
    case "count" if s.withKey.isEmpty =>
      // non-id count: one unit per matching row per node (row-distinct key)
      Some(s.alias -> count(col(s.prop)))
    case "sum" => Some(s.alias -> graft.functions.AggFns.dsum(col(s.prop).cast("double")))
    case "min" => Some(s.alias -> min(col(s.prop).cast("double")))
    case "max" => Some(s.alias -> max(col(s.prop).cast("double")))
    case "avg" => Some(s.alias -> graft.functions.AggFns.davg(col(s.prop).cast("double")))
    case _ => None // value/var/with-key variants -> Tier B
  }

  /** Compile the supported expression subset; None = not Tier-A-able. */
  def compileExpr(e: Expr, now: Long): Option[Column] = e match {
    case Lit(VInt(i)) => Some(lit(i))
    case Lit(VDbl(d)) => Some(lit(d))
    case Lit(VStr(s)) => Some(lit(s))
    case Lit(VBool(b)) => Some(lit(b))
    case Lit(VNone) => Some(lit(null))
    case VarRef("now") | PropRef("now") => Some(lit(now))
    case VarRef("stamp") | PropRef("stamp") => Some(col("stamp"))
    case VarRef("event_time") => Some(col("stamp"))
    case VarRef(n) => Some(col(n)) // row property (validated by analyzer)
    case PropRef(n) => Some(col(n))
    case ListLit(items) => traverse(items.map(compileExpr(_, now))).map(array(_: _*))

    case UnOp("!", x) => compileExpr(x, now).map(!_)
    case UnOp("-", x) => compileExpr(x, now).map(c => -c)

    case BinOp(op, l, r) =>
      for { lc <- compileExpr(l, now); rc <- compileExpr(r, now); c <- binop(op, lc, rc) } yield c

    case PropTest(prop, kind, cmp, None, false) if kind == "is" || kind == "is_not" =>
      compileCmp(col(prop), cmp, now).map(c => if (kind == "is") c else !c)

    case Call(name, args) =>
      traverse(args.map(compileExpr(_, now))).flatMap(as => marshal(name, as))

    case _ => None // frames, ever/never, inline aggs, containers -> Tier B
  }

  private def binop(op: String, l: Column, r: Column): Option[Column] = op match {
    case "&&" => Some(l && r)
    case "||" => Some(l || r)
    case "+" => Some(l + r)
    case "-" => Some(l - r)
    case "*" => Some(l * r)
    case "/" => Some(l / r)
    case "==" => Some(l === r)
    case "!=" => Some(l =!= r)
    case ">" => Some(l > r)
    case ">=" => Some(l >= r)
    case "<" => Some(l < r)
    case "<=" => Some(l <= r)
    case "in" => Some(array_contains(r, l))
    case "contains" => Some(array_contains(l, r))
    case "any" => Some(arrays_overlap(l, r))
    case _ => None
  }

  private def compileCmp(prop: Column, cmp: Comparator, now: Long): Option[Column] =
    compileExpr(cmp.operand, now).flatMap { o =>
      cmp.op match {
        case "==" => Some(prop === o)
        case "!=" => Some(prop =!= o)
        case ">" => Some(prop > o)
        case ">=" => Some(prop >= o)
        case "<" => Some(prop < o)
        case "<=" => Some(prop <= o)
        case "in" => Some(array_contains(o, prop))
        case "contains" => Some(array_contains(prop, o))
        case "any" => Some(arrays_overlap(prop, o))
        case "truthy" => Some(o =!= lit(0) && o.isNotNull)
        case _ => None
      }
    }

  private def marshal(name: String, as: Seq[Column]): Option[Column] = name match {
    case "bucket" if as.size == 2 => Some(TimeFns.bucket(as(0), as(1)))
    case "to_seconds" => Some(TimeFns.toSeconds(as(0)))
    case "to_minutes" => Some(TimeFns.toMinutes(as(0)))
    case "to_hours" => Some(TimeFns.toHours(as(0)))
    case "to_days" => Some(TimeFns.toDays(as(0)))
    case "to_weeks" => Some(TimeFns.toWeeks(as(0)))
    case "get_second" => Some(TimeFns.getSecond(as(0)))
    case "get_minute" => Some(TimeFns.getMinute(as(0)))
    case "get_hour" => Some(TimeFns.getHour(as(0)))
    case "get_month" => Some(TimeFns.getMonth(as(0)))
    case "get_quarter" => Some(TimeFns.getQuarter(as(0)))
    case "get_year" => Some(TimeFns.getYear(as(0)))
    case "get_day_of_week" => Some(TimeFns.getDayOfWeek(as(0)))
    case "get_day_of_month" => Some(TimeFns.getDayOfMonth(as(0)))
    case "get_day_of_year" => Some(TimeFns.getDayOfYear(as(0)))
    case "start_of_second" => Some(TimeFns.startOfSecond(as(0)))
    case "start_of_minute" => Some(TimeFns.startOfMinute(as(0)))
    case "start_of_hour" => Some(TimeFns.startOfHour(as(0)))
    case "start_of_day" | "date_day" => Some(TimeFns.startOfDay(as(0)))
    case "start_of_week" => Some(TimeFns.startOfWeek(as(0)))
    case "start_of_month" => Some(TimeFns.startOfMonth(as(0)))
    case "start_of_quarter" => Some(TimeFns.startOfQuarter(as(0)))
    case "start_of_year" => Some(TimeFns.startOfYear(as(0)))
    case _ => None
  }
}

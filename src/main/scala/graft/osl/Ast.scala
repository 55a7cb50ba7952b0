package graft.osl

/** OSL abstract syntax — our own typed AST for the language surface described
  * in `/root/reference/docs/osl/language_reference.md` (grammar observed from
  * docs + `test/test_osl_language.h` cases; implementation is original). */
object Ast {

  // ------------------------------------------------------------- expressions
  sealed trait Expr extends Serializable
  final case class Lit(v: Value) extends Expr
  final case class VarRef(name: String) extends Expr
  /** Row property reference (resolved against the current cursor). */
  final case class PropRef(name: String) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class SetLit(items: Seq[Expr]) extends Expr
  final case class DictLit(pairs: Seq[(Expr, Expr)]) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class UnOp(op: String, e: Expr) extends Expr
  final case class Call(name: String, args: Seq[Expr]) extends Expr
  /** Method-call sugar: recv.name(args) — e.g. `s.split(' ')`. */
  final case class MethodCall(recv: Expr, name: String, args: Seq[Expr]) extends Expr
  final case class Subscript(recv: Expr, index: Expr) extends Expr

  /** Comparator inside `.is(== x)` etc: op ∈ ==,!=,>,>=,<,<=,in,contains,any;
    * a bare expression means truthy-match. */
  final case class Comparator(op: String, operand: Expr) extends Serializable

  /** Time frame modifier on property tests / inline aggs / each_row. */
  sealed trait Frame extends Serializable
  final case class Within(span: Expr, anchor: Expr) extends Frame
  final case class LookAhead(span: Expr, anchor: Option[Expr]) extends Frame
  final case class LookBack(span: Expr, anchor: Option[Expr]) extends Frame
  final case class DateRange(start: Expr, end: Expr) extends Frame

  /** Property filter chain: `prop[.frame].is/ is_not/ ever/ never(cmp)`.
    * kind ∈ is, is_not, ever, never. `next` shifts ever/never scans one row
    * past the cursor (docs `language_reference.md:88-100`). */
  final case class PropTest(prop: String, kind: String, cmp: Comparator,
                            frame: Option[Frame], next: Boolean) extends Expr

  /** One-line filtered aggregation (`sum(x).within(...) where cond`):
    * kind ∈ sum,count,dcount,min,max,avg,test,row
    * (docs `language_reference.md:767-803`). */
  final case class InlineAgg(kind: String, arg: Option[Expr], frame: Option[Frame],
                             reverse: Boolean, where: Expr) extends Expr

  // -------------------------------------------------------------- statements
  sealed trait Stmt extends Serializable
  final case class Assign(target: Expr, op: String, value: Expr) extends Stmt // op: =, +=, -=
  final case class If(cond: Expr, body: Seq[Stmt], elseBody: Seq[Stmt]) extends Stmt
  final case class ForIn(varName: String, iterable: Expr, body: Seq[Stmt]) extends Stmt
  final case class EachRow(mods: EachRowMods, where: Expr, body: Seq[Stmt]) extends Stmt
  final case class Tally(groups: Seq[Expr]) extends Stmt
  final case class Return(value: Option[Expr]) extends Stmt
  final case class Break(depth: Int, all: Boolean, top: Boolean) extends Stmt
  case object ContinueStmt extends Stmt
  case object ExitStmt extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt

  /** each_row modifier set (docs `language_reference.md:284-295`). */
  final case class EachRowMods(
      reverse: Boolean = false,
      continueFrom: Boolean = false, // .continue(): inherit outer cursor
      next: Boolean = false,         // .next(): advance before evaluating
      from: Option[Expr] = None,
      limit: Option[Expr] = None,
      frame: Option[Frame] = None) extends Serializable

  // ---------------------------------------------------------------- programs
  /** `select` column: agg ∈ count,sum,min,max,avg,value,var; `withKey`
    * overrides the distinct key; `all` disables dedup
    * (`src/queryparserosl.h:966-1122` semantics). */
  final case class SelectCol(agg: String, prop: String, alias: String,
                             withKey: Option[String], all: Boolean) extends Serializable

  /** `sort` section entry: column (select alias or `group`) + ascending flag
    * (`src/rpc_query.cpp:330-341`: sort=column|group, order=asc|desc). */
  final case class SortSpec(column: String, ascending: Boolean) extends Serializable

  final case class Program(select: Seq[SelectCol], code: Seq[Stmt],
                           sort: Seq[SortSpec] = Nil) extends Serializable

  final case class SegmentDef(name: String, flags: Map[String, String],
                              code: Seq[Stmt]) extends Serializable
}

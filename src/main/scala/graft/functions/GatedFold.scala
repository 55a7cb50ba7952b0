package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, CreateNamedStruct, EqualTo, EvalMode, Expression, GreaterThan, GreaterThanOrEqual, If, IsNull, LessThan, LessThanOrEqual, Literal, Not}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Self-gated accumulator fold for DYNAMIC where-conjunct caps, as a
  * Catalyst [[DeclarativeAggregate]] used ONLY over RUNNING window frames.
  *
  * The reference's canonical budget pattern compares the accumulator to a
  * ROW value in the loop's where (`each_row where event.is(== 'buy') &&
  * n < price { n += price … }`, evaluated vars-first pre-increment —
  * src/queryinterpreter.cpp:2151-2274). Unlike the static-literal cap
  * (TierA.capSolve), a failing row does NOT freeze the scan: a later row
  * with a laxer cap side can pass, so the visited set is the sequential
  * recurrence
  *
  *   visit(r) = acc CMP side(r)   (acc = the running pre-visit value)
  *   acc'     = visit(r) ? fold-stages(acc, r) : acc
  *
  * over the residual-where matches in scan order. That is [[FoldSum]]'s
  * left fold with the buffer widened to the (acc, visited) pair and the
  * gate chained ahead of the stages; Spark's
  * `UnboundedPrecedingWindowFunctionFrame` calls `update` once per row in
  * the window sort order with no partial/merge, so both the gate sequence
  * and the (possibly floating-point) add sequence are bit-identical to
  * the interpreter's — forward, or backward over a mirrored row-number
  * sort.
  *
  * Children: `init` (foldable double), `cand` (boolean — whether this
  * row is a residual-where CANDIDATE at all; single loops pre-filter and
  * pass `true`, chain tops evaluate it in-row because the witness
  * windows need every row in the frame — a non-candidate row neither
  * tests the gate nor updates the accumulator), `gateCount` (foldable
  * int, ≥ 1), then `gateCount` (op: foldable string, side: double) gate
  * pairs — ANDed, each comparing the RUNNING acc to the row's side —
  * then interleaved (guard: boolean, value: double) stage pairs in
  * statement order, exactly as [[FoldSum]]. A NULL gate side is the interpreter's
  * nil compare: `Value.cmp` falls through to the string path where a
  * numeric left side is a nonempty string vs `""`, so {>, >=, !=} hold
  * and {<, <=, ==} fail — a constant per op, baked in here.
  *
  * Returns `struct(acc: double, vis: boolean)` per row: `vis` is whether
  * THIS row visited, `acc` the post-visit value (increments lead the
  * body, so body reads at a visited row observe exactly this).
  *
  * Deliberately NOT mergeable, like [[FoldSum]]: [[mergeExpressions]]
  * throws so a non-window (partial-agg) use fails at planning.
  */
case class GatedFold(children: Seq[Expression]) extends DeclarativeAggregate {

  private val CmpOps = Set("<", "<=", ">", ">=", "==", "!=")

  private def cand: Expression = children(1)

  private def gateCount: Int = children(2) match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  private def gatePairs: Seq[(String, Expression)] =
    children.slice(3, 3 + 2 * gateCount).grouped(2).map { p =>
      val op = p.head match {
        case Literal(s: UTF8String, StringType) => s.toString
        case _ => ""
      }
      (op, p(1))
    }.toSeq

  private def stagePairs: Seq[(Expression, Expression)] =
    children.drop(3 + 2 * gateCount).grouped(2).map(p => (p(0), p(1))).toSeq

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 3)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold needs init, cand, gateCount, gates and stages")
    if (!children.head.foldable || children.head.dataType != DoubleType)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold init must be a foldable double")
    if (children(1).dataType != BooleanType)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold cand must be boolean")
    if (!children(2).foldable || children(2).dataType != IntegerType ||
        gateCount < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold gateCount must be a foldable positive int")
    if (children.size < 3 + 2 * gateCount ||
        (children.size - 3 - 2 * gateCount) % 2 != 0)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold needs gateCount (op, side) pairs then (guard, value) pairs")
    val badGate = gatePairs.collectFirst {
      case (op, _) if !CmpOps(op) =>
        s"gate op must be one of $CmpOps, got '$op'"
      case (_, s) if s.dataType != DoubleType =>
        s"gate side must be double, got ${s.dataType.simpleString}"
    }
    if (badGate.isDefined) return TypeCheckResult.TypeCheckFailure(badGate.get)
    val bad = stagePairs.collectFirst {
      case (g, _) if g.dataType != BooleanType =>
        s"stage guard must be boolean, got ${g.dataType.simpleString}"
      case (_, v) if v.dataType != DoubleType =>
        s"stage value must be double, got ${v.dataType.simpleString}"
    }
    bad.map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("acc", DoubleType, nullable = false),
    StructField("vis", BooleanType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gated_fold"

  private lazy val acc =
    AttributeReference("acc", DoubleType, nullable = false)()
  private lazy val vis =
    AttributeReference("vis", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc, vis)

  override lazy val initialValues: Seq[Expression] =
    Seq(children.head, Literal(false, BooleanType))

  // both update expressions are projected against the OLD buffer row, so
  // the gate and the stage chain observe the same pre-row acc
  private lazy val gatePass: Expression =
    gatePairs.map { case (op, side) =>
      val cmp: Expression = op match {
        case "<"  => LessThan(acc, side)
        case "<=" => LessThanOrEqual(acc, side)
        case ">"  => GreaterThan(acc, side)
        case ">=" => GreaterThanOrEqual(acc, side)
        case "==" => EqualTo(acc, side)
        case "!=" => Not(EqualTo(acc, side))
      }
      // nil side: Value.cmp string path — numeric vs "" ⇒ {>, >=, !=}
      // hold, {<, <=, ==} fail (constant per op)
      val nilTruth = op == ">" || op == ">=" || op == "!="
      If(IsNull(side), Literal(nilTruth, BooleanType), cmp): Expression
    }.reduce(And(_, _)) match {
      // a null candidacy is the interpreter's falsy where (never a visit)
      case g => And(If(IsNull(cand), Literal(false, BooleanType), cand), g)
    }

  override lazy val updateExpressions: Seq[Expression] = {
    val accNext = stagePairs.foldLeft(acc: Expression) { case (s, (g, v)) =>
      g match {
        case Literal(true, BooleanType) => Add(s, v, EvalMode.LEGACY)
        case _ => If(g, Add(s, v, EvalMode.LEGACY), s)
      }
    }
    Seq(If(gatePass, accNext, acc), gatePass)
  }

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "graft_gated_fold is order-sensitive and supports only running window frames")

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal(UTF8String.fromString("acc"), StringType), acc,
      Literal(UTF8String.fromString("vis"), StringType), vis))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GatedFold = copy(children = newChildren)
}

object GatedFold {

  /** Register `graft_gated_fold` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gated_fold",
      (children: Seq[Expression]) => GatedFold(children),
      "scala_udf")

  /** The gated running fold as a Column — apply `.over(frame)` with a
    * ROWS UNBOUNDED PRECEDING → CURRENT ROW frame on the scan order.
    * `gates` are (cmpOp, side-as-double) conjuncts comparing the running
    * accumulator to the row; `stages` are (guard, value-as-double) in
    * statement order. Result: `struct(acc, vis)`. */
  def gatedFold(init: Double, cand: Column, gates: Seq[(String, Column)],
                stages: Seq[(Column, Column)]): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    val args = Seq(lit(init), cand, lit(gates.size)) ++
      gates.flatMap { case (op, s) => Seq(lit(op), s) } ++
      stages.flatMap { case (g, v) => Seq(g, v) }
    call_function("graft_gated_fold", args: _*)
  }
}

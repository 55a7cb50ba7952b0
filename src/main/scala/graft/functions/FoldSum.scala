package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, EvalMode, Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Ordered multi-statement accumulator fold for OSL scripts, as a
  * Catalyst [[DeclarativeAggregate]] used ONLY over RUNNING window frames.
  *
  * An OSL body may update one accumulator with SEVERAL leading statements
  * per visit (`total += value` then `if cond { total += bonus }`). The
  * reference interpreter applies the adds strictly in statement order
  * (`src/queryinterpreter.cpp:1786` `+=` via `cvar` double addition), so
  * the accumulated double is the LEFT FOLD
  * `((init + v1) + v2) + …` over every (guard-passing) increment of every
  * visited row in scan order. A window `SUM` over a per-visit total
  * re-associates that as `init + (v1 + v2) + …` — different IEEE result —
  * which is why multi-statement floating-point accumulators declined to
  * Tier B before round 13.
  *
  * This aggregate replays the exact sequence: its buffer is one double and
  * its update expression chains the visit's stages in statement order,
  * `acc′ = step_n(…step_1(acc))` with `step_i = IF(guard_i, acc + value_i,
  * acc)`. Spark's `UnboundedPrecedingWindowFunctionFrame` (the processor
  * behind `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`) calls
  * `update` once per row as the frame grows — sequentially, in the window
  * sort order, with no partial/merge step — so the compiled fold is
  * bit-identical to the interpreter's, forward or (over a mirrored
  * row-number sort) backward.
  *
  * Children: `init` (foldable double literal — the accumulator's compile
  * time initial value) followed by interleaved `(guard: boolean,
  * value: double)` stage pairs in statement order. A null guard skips its
  * stage (Catalyst `If` treats null as false — the interpreter's falsy
  * skip); null VALUES must be coalesced to 0.0 by the caller (the
  * interpreter ADDS zero for nil props rather than skipping —
  * `Value.plus(_, VNone)`).
  *
  * Deliberately NOT mergeable: a left fold over doubles has no
  * order-preserving combine. [[mergeExpressions]] throws, so any plan that
  * tries partial aggregation (a non-window use) fails loudly at planning
  * rather than silently re-associating.
  */
case class FoldSum(children: Seq[Expression]) extends DeclarativeAggregate {

  private def stagePairs: Seq[(Expression, Expression)] =
    children.tail.grouped(2).map(p => (p(0), p(1))).toSeq

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty || children.tail.size % 2 != 0)
      return TypeCheckResult.TypeCheckFailure(
        "graft_fold_sum needs an init plus (guard, value) pairs")
    if (!children.head.foldable || children.head.dataType != DoubleType)
      return TypeCheckResult.TypeCheckFailure(
        "graft_fold_sum init must be a foldable double")
    val bad = stagePairs.collectFirst {
      case (g, _) if g.dataType != BooleanType =>
        s"stage guard must be boolean, got ${g.dataType.simpleString}"
      case (_, v) if v.dataType != DoubleType =>
        s"stage value must be double, got ${v.dataType.simpleString}"
    }
    bad.map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_fold_sum"

  private lazy val acc =
    AttributeReference("acc", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)

  override lazy val initialValues: Seq[Expression] = Seq(children.head)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    stagePairs.foldLeft(acc: Expression) { case (s, (g, v)) =>
      g match {
        case Literal(true, BooleanType) => Add(s, v, EvalMode.LEGACY)
        case _ => If(g, Add(s, v, EvalMode.LEGACY), s)
      }
    })

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "graft_fold_sum is order-sensitive and supports only running window frames")

  override lazy val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FoldSum = copy(children = newChildren)
}

object FoldSum {

  /** Register `graft_fold_sum` in the session's function registry
    * (idempotent); needed before [[foldSum]] columns resolve. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fold_sum",
      (children: Seq[Expression]) => FoldSum(children),
      "scala_udf")

  /** The running accumulator fold as a Column — apply `.over(frame)` with a
    * ROWS UNBOUNDED PRECEDING → CURRENT ROW frame on the scan order.
    * `stages` are (guard, value-as-double) in statement order. */
  def foldSum(init: Double, stages: Seq[(Column, Column)]): Column = {
    SparkSession.getActiveSession.foreach(register)
    val args = org.apache.spark.sql.functions.lit(init) +:
      stages.flatMap { case (g, v) => Seq(g, v) }
    call_function("graft_fold_sum", args: _*)
  }
}

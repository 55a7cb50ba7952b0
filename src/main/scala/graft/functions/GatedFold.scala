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
  *   visit(r) = AND over gates g: acc_{g.idx} CMP side_g(r)   (pre-visit)
  *   acc_i'   = visit(r) ? fold-stages_i(acc_i, r) : acc_i
  *
  * over the residual-where matches in scan order. That is [[FoldSum]]'s
  * left fold with the buffer widened to the (acc_0..acc_{n−1}, visited)
  * TUPLE and the gates chained ahead of the stages — round 15 shipped the
  * single-accumulator form; the JOINT buffer (this file) generalizes it
  * to any number of gating accumulators (`n < price && m < qty` with
  * both names incremented), each gate addressing its accumulator by
  * index. Spark's `UnboundedPrecedingWindowFunctionFrame` calls `update`
  * once per row in the window sort order with no partial/merge, so both
  * the gate sequence and the (possibly floating-point) add sequences are
  * bit-identical to the interpreter's — forward, or backward over a
  * mirrored row-number sort.
  *
  * Children layout:
  *   `nAcc` (foldable int ≥ 1),
  *   `init_0 … init_{nAcc−1}` (foldable doubles),
  *   `cand` (boolean — whether this row is a residual-where CANDIDATE at
  *     all; single loops pre-filter and pass `true`, chain tops evaluate
  *     it in-row because the witness windows need every row — a
  *     non-candidate row neither tests the gates nor updates any
  *     accumulator),
  *   `gateCount` (foldable int ≥ 1), then `gateCount`
  *   (accIdx: foldable int, op: foldable string, side: double) gate
  *     triples — ANDed, each comparing ITS accumulator's RUNNING value to
  *     the row's side,
  *   then per accumulator i: `stageCount_i` (foldable int) followed by
  *   `stageCount_i` interleaved (guard: boolean, value: double) stage
  *   pairs in statement order, exactly as [[FoldSum]].
  *
  * A NULL gate side is the interpreter's nil compare: `Value.cmp` falls
  * through to the string path where a numeric left side is a nonempty
  * string vs `""`, so {>, >=, !=} hold and {<, <=, ==} fail — a constant
  * per op, baked in here.
  *
  * Returns `struct(acc: double[, acc1: double, …], vis: boolean)` per
  * row: `vis` is whether THIS row visited, each acc the post-visit value
  * (increments lead the body, so body reads at a visited row observe
  * exactly these). The first accumulator's field keeps the round-15 name
  * `acc` so single-gate consumers are unchanged.
  *
  * Deliberately NOT mergeable, like [[FoldSum]]: [[mergeExpressions]]
  * throws so a non-window (partial-agg) use fails at planning.
  */
case class GatedFold(children: Seq[Expression]) extends DeclarativeAggregate {

  private val CmpOps = Set("<", "<=", ">", ">=", "==", "!=")

  private def nAcc: Int = children.head match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  private def inits: Seq[Expression] = children.slice(1, 1 + nAcc)

  private def cand: Expression = children(1 + nAcc)

  private def gateCount: Int = children(2 + nAcc) match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  private def gateTriples: Seq[(Int, String, Expression)] =
    children.slice(3 + nAcc, 3 + nAcc + 3 * gateCount).grouped(3).map { t =>
      val idx = t.head match {
        case Literal(v: Int, IntegerType) => v
        case _ => -1
      }
      val op = t(1) match {
        case Literal(s: UTF8String, StringType) => s.toString
        case _ => ""
      }
      (idx, op, t(2))
    }.toSeq

  /** Per-accumulator (guard, value) stage pairs; None on malformed
    * layout (checkInputDataTypes reports it). */
  private def stageGroups: Option[Seq[Seq[(Expression, Expression)]]] = {
    var rest = children.drop(3 + nAcc + 3 * gateCount)
    val groups = Seq.newBuilder[Seq[(Expression, Expression)]]
    (0 until nAcc).foreach { _ =>
      val cnt = rest.headOption match {
        case Some(Literal(v: Int, IntegerType)) if v >= 0 => v
        case _ => return None
      }
      if (rest.size < 1 + 2 * cnt) return None
      groups += rest.slice(1, 1 + 2 * cnt).grouped(2)
        .map(p => (p(0), p(1))).toSeq
      rest = rest.drop(1 + 2 * cnt)
    }
    if (rest.nonEmpty) None else Some(groups.result())
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 4)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold needs nAcc, inits, cand, gateCount, gates and stages")
    if (!children.head.foldable || children.head.dataType != IntegerType ||
        nAcc < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold nAcc must be a foldable positive int")
    if (children.size < 3 + nAcc ||
        inits.exists(i => !i.foldable || i.dataType != DoubleType))
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold inits must be foldable doubles")
    if (cand.dataType != BooleanType)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold cand must be boolean")
    if (!children(2 + nAcc).foldable ||
        children(2 + nAcc).dataType != IntegerType || gateCount < 1)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold gateCount must be a foldable positive int")
    if (children.size < 3 + nAcc + 3 * gateCount)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gated_fold needs gateCount (accIdx, op, side) triples")
    val badGate = gateTriples.collectFirst {
      case (i, _, _) if i < 0 || i >= nAcc =>
        s"gate accIdx must be in [0, $nAcc), got $i"
      case (_, op, _) if !CmpOps(op) =>
        s"gate op must be one of $CmpOps, got '$op'"
      case (_, _, s) if s.dataType != DoubleType =>
        s"gate side must be double, got ${s.dataType.simpleString}"
    }
    if (badGate.isDefined) return TypeCheckResult.TypeCheckFailure(badGate.get)
    stageGroups match {
      case None =>
        TypeCheckResult.TypeCheckFailure(
          "graft_gated_fold needs per-accumulator stageCount + (guard, value) pairs")
      case Some(gs) =>
        val bad = gs.flatten.collectFirst {
          case (g, _) if g.dataType != BooleanType =>
            s"stage guard must be boolean, got ${g.dataType.simpleString}"
          case (_, v) if v.dataType != DoubleType =>
            s"stage value must be double, got ${v.dataType.simpleString}"
        }
        bad.map(TypeCheckResult.TypeCheckFailure)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
    }
  }

  private def accField(i: Int): String = if (i == 0) "acc" else s"acc$i"

  override def dataType: DataType = StructType(
    (0 until nAcc).map(i => StructField(accField(i), DoubleType, nullable = false)) :+
      StructField("vis", BooleanType, nullable = false))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gated_fold"

  private lazy val accs: Seq[AttributeReference] =
    (0 until nAcc).map(i =>
      AttributeReference(accField(i), DoubleType, nullable = false)())
  private lazy val vis =
    AttributeReference("vis", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = accs :+ vis

  override lazy val initialValues: Seq[Expression] =
    inits :+ Literal(false, BooleanType)

  // all update expressions are projected against the OLD buffer row, so
  // every gate and every stage chain observe the same pre-row accs
  private lazy val gatePass: Expression =
    gateTriples.map { case (idx, op, side) =>
      val a = accs(idx)
      val cmp: Expression = op match {
        case "<"  => LessThan(a, side)
        case "<=" => LessThanOrEqual(a, side)
        case ">"  => GreaterThan(a, side)
        case ">=" => GreaterThanOrEqual(a, side)
        case "==" => EqualTo(a, side)
        case "!=" => Not(EqualTo(a, side))
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
    val groups = stageGroups.get
    accs.zip(groups).map { case (a, stages) =>
      val accNext = stages.foldLeft(a: Expression) { case (s, (g, v)) =>
        g match {
          case Literal(true, BooleanType) => Add(s, v, EvalMode.LEGACY)
          case _ => If(g, Add(s, v, EvalMode.LEGACY), s)
        }
      }
      If(gatePass, accNext, a): Expression
    } :+ gatePass
  }

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "graft_gated_fold is order-sensitive and supports only running window frames")

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(
      accs.zipWithIndex.flatMap { case (a, i) =>
        Seq(Literal(UTF8String.fromString(accField(i)), StringType), a)
      } ++ Seq(Literal(UTF8String.fromString("vis"), StringType), vis))

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

  /** Single-accumulator form (round 15): `gates` are (cmpOp,
    * side-as-double) conjuncts on THE accumulator. Result:
    * `struct(acc, vis)`. */
  def gatedFold(init: Double, cand: Column, gates: Seq[(String, Column)],
                stages: Seq[(Column, Column)]): Column =
    gatedFoldN(Seq((init, stages)), cand,
      gates.map { case (op, s) => (0, op, s) })

  /** The JOINT gated running fold as a Column — apply `.over(frame)` with
    * a ROWS UNBOUNDED PRECEDING → CURRENT ROW frame on the scan order.
    * `accs` are (init, statement-ordered (guard, value-as-double) stages)
    * per gating accumulator; `gates` are (accIdx, cmpOp, side-as-double)
    * conjuncts, each comparing its accumulator's running value to the
    * row. Result: `struct(acc[, acc1, …], vis)` — field `acc` is
    * accumulator 0, `acc<i>` the rest. */
  def gatedFoldN(accs: Seq[(Double, Seq[(Column, Column)])], cand: Column,
                 gates: Seq[(Int, String, Column)]): Column = {
    SparkSession.getActiveSession.foreach(register)
    import org.apache.spark.sql.functions.lit
    val args = Seq(lit(accs.size)) ++ accs.map(a => lit(a._1)) ++
      Seq(cand, lit(gates.size)) ++
      gates.flatMap { case (i, op, s) => Seq(lit(i), lit(op), s) } ++
      accs.flatMap { case (_, st) =>
        Seq(lit(st.size)) ++ st.flatMap { case (g, v) => Seq(g, v) } }
    call_function("graft_gated_fold", args: _*)
  }
}

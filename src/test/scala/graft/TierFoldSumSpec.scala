package graft

import org.apache.spark.sql.functions.col
import graft.osl._

/** Round-13 Tier A feature: MULTI-STATEMENT accumulator bodies — one
  * accumulator updated by several leading statements per visit (the
  * reference's avg idiom: a guarded `total += value` plus `total += 1` in
  * the same body, src/queryinterpreter.cpp:1786 `+=` fold). A window SUM
  * re-associates the interpreter's left fold (`(t+a)+b` vs `t+(a+b)`), so
  * these shapes compile through [[graft.functions.FoldSum]]: a
  * statement-ordered declarative aggregate whose RUNNING window frame
  * updates once per row in scan order — bit-identical doubles by
  * construction. Tier B (the interpreter) is the authority; every diff
  * here compares raw double BITS, not rounded values. */
class TierFoldSumSpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val Tue = Mon + 86400000L
  private val H = 3600000L

  private lazy val world = {
    val rnd = new scala.util.Random(131)
    val events = Seq("purchase", "view", "signup", "buy", "error")
    (0 until 120).map { i =>
      (s"u${i % 6}", Mon + (i / 6) * 5 * H + (i % 6) * H,
        events(rnd.nextInt(5)),
        // raw irrational-ish doubles — fp association errors can't hide
        rnd.nextDouble() * 97.3 + 0.017)
    }.toDF("id", "stamp", "event", "value").cache()
  }

  /** Bit-exact tier diff: Tier A must engage AND match the interpreter's
    * doubles to the last ULP. */
  private def diff(script: String,
                   data: org.apache.spark.sql.DataFrame = world): Unit = {
    val p = Parser.program(script)
    assert(TierA.compile(p, data, Tue, 1800000L).isDefined,
      s"expected Tier A to engage for:\n$script")
    val a = OslEngine.query(data, script, now = Tue)
    assert(!a.queryExecution.executedPlan.toString.contains("MapGroups"),
      s"Tier A plan regressed to flatMapGroups for:\n$script")
    val b = OslEngine.query(data, script, now = Tue, forceTierB = true)
    val cols = a.columns
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(r => cols.map(c => Option(r.get(r.fieldIndex(c))).map {
          case d: Double => java.lang.Double.doubleToLongBits(d).toString
          case o => o.toString
        }.orNull).toVector).toSet
    assert(canon(a) == canon(b), s"tier mismatch for:\n$script")
    assert(canon(a).nonEmpty, s"empty result for:\n$script")
  }

  private def planOf(script: String): String =
    OslEngine.query(world, script, now = Tue)
      .queryExecution.executedPlan.toString

  test("same-accumulator two fp statements fold in statement order") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  total += value
        |  total += value
        |  << bucket(total, 64)
        |end
        |""".stripMargin)
  }

  test("the avg idiom: guarded fp add + literal count in one body") {
    val script =
      """select
        |  count id as customers
        |end
        |total = 0
        |n = 0
        |each_row where stamp.is(> 0)
        |  if event.is(== 'purchase')
        |    total += value
        |  end
        |  total += 1
        |  n += 1
        |  << bucket(total, 64), bucket(n, 8)
        |end
        |""".stripMargin
    diff(script)
    // the fp accumulator rides FoldSum; the literal counter keeps the
    // plain running SUM (codegen'd) — both visible in the physical plan
    val plan = planOf(script)
    assert(plan.contains("graft_fold_sum"), "expected FoldSum in the plan")
  }

  test("nonzero integer init seeds the fold buffer") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 7
        |each_row where stamp.is(> 0)
        |  total += value
        |  << bucket(total, 64)
        |end
        |""".stripMargin)
  }

  test("else-branch increments fold under the guard's falsy complement") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  if event.is(== 'buy')
        |    total += value
        |  else
        |    total -= value
        |  end
        |  total += value
        |  << bucket(total, 64)
        |end
        |""".stripMargin)
  }

  test("two increments inside one guarded branch apply in order") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  if event.is(== 'buy')
        |    total += value
        |    total += 1
        |  end
        |  << bucket(total, 64)
        |end
        |""".stripMargin)
  }

  test("reverse top folds backward through the DESC running frame") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row.reverse() where stamp.is(> 0)
        |  total += value
        |  total -= value
        |  total += value
        |  << bucket(total, 64)
        |end
        |""".stripMargin)
  }

  test("chain reads observe the spawn's multi-statement fold value") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where event.is(== 'signup')
        |  total += value
        |  total += 1
        |  each_row.continue().next() where event.is(== 'buy')
        |    << bucket(total, 64), event
        |  end
        |end
        |""".stripMargin)
  }

  // round 14 (VERDICT r13 #6): a guard expression reading a NIL prop —
  // the interpreter's nil compare is falsy, so the stage skips; and a nil
  // INCREMENT value adds 0.0 (Value.plus(_, VNone)). Both asserted in the
  // FoldSum scaladoc, previously only unit-covered.
  private lazy val worldNil = {
    val rnd = new scala.util.Random(313)
    val events = Seq("purchase", "view", "signup", "buy", "error")
    (0 until 120).map { i =>
      (s"u${i % 6}", Mon + (i / 6) * 5 * H + (i % 6) * H,
        events(rnd.nextInt(5)),
        rnd.nextDouble() * 97.3 + 0.017,
        if (i % 3 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextDouble() * 80))
    }.toDF("id", "stamp", "event", "value", "score").cache()
  }

  test("a guard reading a nil prop skips that stage (nil compares falsy)") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  if score.is(> 40)
        |    total += value
        |  end
        |  total += 1
        |  << bucket(total, 64)
        |end
        |""".stripMargin, data = worldNil)
  }

  test("a nil increment value adds 0.0 through the fold") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  total += score
        |  total += 1
        |  << bucket(total, 64)
        |end
        |""".stripMargin, data = worldNil)
  }

  test("depth-3 chain reads observe the spawn's multi-statement fold value") {
    diff(
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where event.is(== 'signup')
        |  total += value
        |  total += 1
        |  each_row.continue().next() where event.is(== 'view')
        |    each_row.continue().next() where event.is(== 'buy')
        |      << bucket(total, 64), event
        |    end
        |  end
        |end
        |""".stripMargin)
  }

  test("single-statement zero-init fp accumulators keep the plain SUM") {
    val script =
      """select
        |  count id as customers
        |end
        |total = 0
        |each_row where stamp.is(> 0)
        |  total += value
        |  << bucket(total, 64)
        |end
        |""".stripMargin
    diff(script)
    assert(!planOf(script).contains("graft_fold_sum"),
      "single-statement zero-init shape must not pay the custom fold")
  }

  test("randomized grid: multi-statement bodies, Tier A == Tier B bit-exact") {
    val rnd = new scala.util.Random(1313)
    val guards = Seq("event.is(== 'buy')", "event.is(== 'purchase')",
      "value.is(> 50)")
    val incs = Seq("total += value", "total -= value", "total += 3",
      "total -= 1")
    for (i <- 0 until 14) {
      val nStmts = 2 + rnd.nextInt(2)
      val body = (0 until nStmts).map { _ =>
        val inc = incs(rnd.nextInt(incs.size))
        if (rnd.nextBoolean()) inc
        else {
          val g = guards(rnd.nextInt(guards.size))
          if (rnd.nextBoolean())
            s"if $g\n    $inc\n  end"
          else
            s"if $g\n    $inc\n  else\n    ${incs(rnd.nextInt(incs.size))}\n  end"
        }
      }.mkString("\n  ")
      val init = if (rnd.nextBoolean()) 0 else rnd.nextInt(9)
      val rev = if (rnd.nextBoolean()) ".reverse()" else ""
      val script =
        s"""select
           |  count id as customers
           |end
           |total = $init
           |each_row$rev where stamp.is(> 0)
           |  $body
           |  << bucket(total, 32)
           |end
           |""".stripMargin
      diff(script)
    }
  }

  test("FoldSum outside a window fails loudly (no silent re-association)") {
    import graft.functions.FoldSum
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val agg = FoldSum.foldSum(0.0,
      Seq((org.apache.spark.sql.functions.lit(true), col("v"))))
    val ex = intercept[Throwable] {
      df.groupBy(col("k")).agg(agg.as("t")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(ex).exists(_.isInstanceOf[UnsupportedOperationException]),
      s"expected UnsupportedOperationException, got $ex")
  }
}

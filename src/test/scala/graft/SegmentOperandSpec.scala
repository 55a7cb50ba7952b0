package graft

import graft.osl._

/** Segment-level ever/never operands must be ROW-INDEPENDENT to compile:
  * at segment top level the cursor is invalid, so the interpreter
  * evaluates the operand to nil (VNone) — a compiled per-scanned-row
  * column compare would diverge silently. Such predicates decline to
  * Tier B; this differential spec pins both the decline and the
  * agreement. */
class SegmentOperandSpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val H = 3600000L

  private lazy val world = Seq(
    ("u1", Mon + 0 * H, "signup", "rod", 10.0, 5.0),
    ("u1", Mon + 1 * H, "purchase", "reel", 60.0, 100.0),
    ("u2", Mon + 0 * H, "view", "fly", 2.0, 1.0),
    ("u2", Mon + 2 * H, "purchase", "fly", 3.0, 2.0),
    ("u3", Mon + 0 * H, "error", "rod", 7.0, 9.0))
    .toDF("id", "stamp", "event", "product_name", "product_price", "budget")
    .cache()

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("row-column operand in a segment ever test declines and agrees with Tier B") {
    val script =
      """@segment rich
        |if product_price.ever(> budget)
        |  return(true)
        |end
        |""".stripMargin
    val defs = Parser.segments(script)
    assert(TierA.compileSegments(defs, world, Mon + 100 * H).isEmpty,
      "segment-level row-dependent operand must decline to Tier B")
    val a = canon(OslEngine.segments(world, script, now = Mon + 100 * H))
    val b = canon(OslEngine.segments(world, script, now = Mon + 100 * H,
      forceTierB = true))
    assert(a == b, s"A=$a B=$b")
  }

  test("literal and container operands still compile at segment level") {
    val script =
      """@segment buyers
        |if event.ever(== 'purchase') && product_name.ever(in ['rod', 'fly'])
        |  return(true)
        |end
        |""".stripMargin
    val defs = Parser.segments(script)
    assert(TierA.compileSegments(defs, world, Mon + 100 * H).isDefined)
    val a = canon(OslEngine.segments(world, script, now = Mon + 100 * H))
    val b = canon(OslEngine.segments(world, script, now = Mon + 100 * H,
      forceTierB = true))
    assert(a == b)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-exact aggregation helpers.
  *
  * Double summation is order-dependent: Spark's partial/final aggregation and
  * DuckDB's sum visit rows in different orders, so `sum(double)` differs in
  * the last ULPs between engines and a value-hash comparison fails. We sum in
  * exact decimal space instead — per-row cast to DECIMAL(18,4) (test data
  * carries 2 decimal places, so the cast is exact and order-independent) and
  * cast the final sum back to double (deterministic IEEE conversion both
  * sides).
  *
  * The reference stores doubles as fixed-point ×10,000 (`src/grid.cpp:809`,
  * SURVEY §1.2), so DECIMAL(·,4) also mirrors its semantics exactly.
  */
object AggFns {

  private val Dec = "decimal(28,4)"

  /** Order-independent exact sum of a double column, returned as double.
    * Oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact-sum-based average: decimal sum, IEEE double division by count.
    * Oracle: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)
}

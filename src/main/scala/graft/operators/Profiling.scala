package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality report every pipeline stage
  * gates on (null surge, cardinality collapse, range drift). The reference
  * exposes the same information per property through its attribute index
  * (`src/attributes.cpp` value enumeration; `/v1/query/{table}/property`
  * counts); here it's a single aggregation over any DataFrame.
  *
  * Scale shape: ONE scan — all columns' aggregates evaluate in a single
  * `agg` (the exact distinct counts share one Expand), then the 1-row
  * result unpivots driver-free via `stack`. No per-column passes.
  *
  * min/max surface as strings so heterogeneous columns share one schema;
  * profile numeric DOUBLE columns through an explicit rounding cast first
  * if cross-engine string formatting matters. */
object Profiling {

  /** Long-format profile `(column, n_nonnull, n_distinct, min_value,
    * max_value)`, one row per requested column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stacked) as " +
        "(column, n_nonnull, n_distinct, min_value, max_value)"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing: membership depends only on the
  * row's id (md5 60-bit hash mod 100), so samples are reproducible across
  * runs, engines and cluster sizes, can be unioned consistently across
  * tables, and never need a shuffle — it's a plain filter at scan speed.
  * The standard way training mixes weight their sources. */
object Sampling {

  /** Stable 0..99 percentile bucket for an id (md5 first 15 hex chars as a
    * 60-bit int, the engine-portable recipe used across this codebase). */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(100L))

  /** Keep ~pct% of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, id: Column, pct: Int): DataFrame =
    df.where(hashBucket(id) < pct)

  /** Per-stratum rates: keep ~rates(stratum)% of each stratum's rows
    * (strata absent from the map are dropped) — source-weighted corpus
    * mixing in one filter. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0): Column) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(id) < rate)
  }
}

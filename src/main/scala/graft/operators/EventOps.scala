package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFns

/** Core OpenSet event-analytics operators over the normalized event stream
  * `(id, stamp, event, …props)` — Spark-first: window functions and
  * conditional aggregation instead of the reference's per-customer opcode
  * interpreter.
  *
  * Reference semantics cited per method. None of these shuffle more than
  * once on the person key; every per-person construct reuses one
  * `Window.partitionBy(id)` so Catalyst plans a single Exchange for chains
  * of them.
  */
object EventOps {

  /** Per-person event-time window, the backbone of all sequence semantics. */
  def personWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy("id").orderBy("stamp")

  /** Synthetic `session` property: 1-based counter incrementing whenever the
    * gap to the previous event of the same person exceeds `gapMs`.
    * Reference: `src/grid.cpp:515-522` (computed at grid decode); default
    * gap 30 min (`src/table.h:125`).
    *
    * Implementation: classic gap-and-island —
    * `sum(gap > gapMs ? 1 : 0) over (person rows unbounded preceding) + 1`.
    * One shuffle on `id`; codegen-friendly (no UDFs).
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * TimeFns.MinuteMs): DataFrame = {
    val lagStamp = lag(col("stamp"), 1).over(personWindow)
    val isNew = when(lagStamp.isNull, lit(0))
      .when(col("stamp") - lagStamp > gapMs, lit(1))
      .otherwise(lit(0))
    events.withColumn("session",
      sum(isNew).over(personWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1)
  }

  /** Per-person row metadata used by OSL marshals `cursor`, `row_count`,
    * `first_stamp`, `last_stamp`, `session_count`
    * (`src/queryinterpreter.cpp:1259-1352,1577-1582`). */
  def withPersonStats(events: DataFrame): DataFrame = {
    val whole = Window.partitionBy("id")
    events
      .withColumn("row_no", row_number().over(personWindow))
      .withColumn("row_count", count(lit(1)).over(whole))
      .withColumn("first_stamp", min(col("stamp")).over(whole))
      .withColumn("last_stamp", max(col("stamp")).over(whole))
  }

  /** `.ever` / `.never` property modifiers — person-level existence of a row
    * matching `cond` (`src/queryinterpreter.cpp:2580-2720`, docs
    * `language_reference.md:88-100`). Returns `(id, ever: boolean)`. */
  def ever(events: DataFrame, cond: Column): DataFrame =
    events.groupBy("id").agg((count(when(cond, 1)) > 0).as("ever"))

  /** Person ids for which any row matches `cond` — the bitmap-index
    * pre-filter re-expressed as an aggregation-free semi-join driver
    * (`src/queryindexing.cpp:57-253`). */
  def matchingPersons(events: DataFrame, cond: Column): DataFrame =
    events.where(cond).select("id").distinct()

  /** Property count query (`/v1/query/{table}/property/{name}`,
    * `src/oloop_property.cpp:34-307`): distinct persons per property value.
    * The reference answers this purely from its inverted bitmap index; the
    * Spark shape is a partial-aggregated groupBy + countDistinct, which at
    * scale resolves to two-phase hash agg with map-side combine. */
  def propertyCounts(events: DataFrame, prop: Column, alias: String = "value"): DataFrame =
    events.groupBy(prop.as(alias)).agg(countDistinct(col("id")).as("customers"))

  /** Bucketed property count (`bucket` param of the property endpoint,
    * `src/oloop_property.cpp:139-168`). */
  def propertyCountsBucketed(events: DataFrame, prop: Column, bucketSize: Double): DataFrame =
    propertyCounts(events, TimeFns.bucket(prop, bucketSize), "bucket")

  /** Winsorized per-key value statistics — the outlier-robust step of a
    * numeric-feature pipeline: clip each value to the key's discrete
    * [pLo, pHi] percentiles (rank-based, value-at-position — no floating
    * interpolation, so any engine lands on the same bounds), then
    * aggregate. Returns `(key, n_rows, lo, hi, n_clipped, mean_winsorized)`
    * with the mean through the DECIMAL(28,4) exactness path.
    *
    * Scale shape: ONE per-key sort window yields ranks AND the bounds
    * (min-over-partition of the at-or-above-rank values — no second
    * shuffle, no join back), then a hash agg. The window input is
    * (key, value) pairs only.
    *
    * NULL values are dropped up front: rank-based percentile bounds are
    * only engine-portable over non-null values (Spark's window ORDER BY
    * sorts nulls FIRST, DuckDB's LAST — keeping them would shift every
    * rank and leak null through least/greatest into the clipped mean).
    * Winsorizing a value that does not exist has no meaning anyway. */
  def winsorizedStats(df: DataFrame, key: Column, value: Column,
                      pLo: Double = 0.05, pHi: Double = 0.95,
                      keyAlias: String = "key"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo,$pHi]")
    val wS = Window.partitionBy(col(keyAlias)).orderBy(col("__v"))
    val wP = Window.partitionBy(col(keyAlias))
    def pct(p: Double) =
      min(when(col("__rn") >= ceil(lit(p) * col("__n")), col("__v"))).over(wP)
    df.select(key.as(keyAlias), value.as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(wS))
      .withColumn("__n", count(lit(1)).over(wP))
      .withColumn("__lo", pct(pLo))
      .withColumn("__hi", pct(pHi))
      .withColumn("__cv", least(greatest(col("__v"), col("__lo")), col("__hi")))
      .groupBy(col(keyAlias))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__lo")).as("lo"), min(col("__hi")).as("hi"),
        sum(when(col("__v") < col("__lo") || col("__v") > col("__hi"), 1L)
          .otherwise(0L)).as("n_clipped"),
        (graft.functions.AggFns.dsum(col("__cv")) / count(lit(1)))
          .as("mean_winsorized"))
  }

  /** EXACT distinct count per key, salted for skew: the plain
    * `groupBy(key).agg(countDistinct(v))` puts every row of a hot key on
    * ONE reducer (distinct cannot map-side combine — the reducer must see
    * every value), so a key holding 20% of a 100 TB corpus serializes 20%
    * of the shuffle into one task. Salting splits each key into `salts`
    * sub-groups BY VALUE HASH — every distinct value lands in exactly one
    * (key, salt) cell, so the per-cell distinct counts are disjoint and
    * their per-key sum is exactly `count(distinct v)` — while the hot key's
    * rows spread over `salts` reducers. Two hash aggregations, both
    * partial-combined; the second one is keys-sized.
    *
    * (Additive aggregates — sum/count/min/max — never need this: their
    * map-side partial combine already collapses hot keys before the
    * shuffle. Distinct is THE skewed-aggregation case.) */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
                          salts: Int = 16,
                          keyAlias: String = "key",
                          alias: String = "n_distinct"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.groupBy(key.as(keyAlias), pmod(hash(value), lit(salts)).as("__salt"))
      .agg(countDistinct(value).as("__d"))
      .groupBy(col(keyAlias))
      .agg(sum(col("__d")).as(alias))
  }

  /** Funnel step join: for each person, the first `fromEvent`, then whether a
    * `toEvent` follows within `withinMs` (OSL nested
    * `each_row.continue().next()` — `src/queryinterpreter.cpp:2430-2577`).
    *
    * Declarative (Tier A) form: two conditional aggregations over one
    * groupBy — no self-join, single shuffle on `id`. Returns
    * `(id, first_from, first_to_after)` where `first_to_after` is the stamp
    * of the first qualifying `toEvent` or null.
    */
  def funnel2(events: DataFrame, fromEvent: String, toEvent: String, withinMs: Long): DataFrame = {
    val firstFrom = min(when(col("event") === fromEvent, col("stamp"))).as("first_from")
    val perPerson = events.groupBy("id").agg(
      firstFrom,
      collect_list(when(col("event") === toEvent, col("stamp"))).as("to_stamps"))
    perPerson
      .withColumn("first_to_after",
        array_min(filter(col("to_stamps"),
          s => s >= col("first_from") && s <= col("first_from") + withinMs)))
      .drop("to_stamps")
  }

  /** N-step funnel: the stamp of each step's first qualifying occurrence,
    * where step k must land in `(stamp_{k-1}, stamp_{k-1} + withinMs]` —
    * the general form of the nested `each_row.continue().next()` pattern
    * (src/queryinterpreter.cpp:2430-2577), still one groupBy on `id` and
    * zero self-joins: per-person stamp lists fold step by step in-row.
    * Returns `(id, step_0 … step_{n-1})` stamps (null once a step misses). */
  def funnelN(events: DataFrame, steps: Seq[String], withinMs: Long): DataFrame = {
    require(steps.nonEmpty)
    val listCols = steps.zipWithIndex.map { case (ev, i) =>
      sort_array(collect_list(when(col("event") === ev, col("stamp")))).as(s"__l$i")
    }
    val perPerson = events.groupBy("id").agg(listCols.head, listCols.tail: _*)
    val withSteps = steps.indices.foldLeft(perPerson) { case (df, i) =>
      val stepCol =
        if (i == 0) array_min(col(s"__l$i"))
        else array_min(filter(col(s"__l$i"),
          s => s > col(s"step_${i - 1}") && s <= col(s"step_${i - 1}") + withinMs))
      df.withColumn(s"step_$i", stepCol)
    }
    withSteps.select(col("id") +: steps.indices.map(i => col(s"step_$i")): _*)
  }

  /** Event transition matrix: counts of (event -> immediately next event)
    * per person ordered by (stamp, event_id) — the path-analysis primitive.
    * One window pass + one hash aggregation. */
  def transitions(events: DataFrame, orderTiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("stamp"), orderTiebreak)
    events
      .withColumn("next_event", lead(col("event"), 1).over(w))
      .where(col("next_event").isNotNull)
      .groupBy(col("event"), col("next_event"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("id")).as("customers"))
  }

  /** Top event paths: counts of each n-step sequence of consecutive events
    * per person ordered by (stamp, tiebreak) — the generalized form of
    * [[transitions]] and the reference's sequence-correlation idiom
    * (`src/queryinterpreter.cpp:2430-2577` nested each_row; path examples
    * `README.md:244-316`). One window pass (n-1 `lead`s share one sort) +
    * one hash aggregation. */
  def paths(events: DataFrame, n: Int, orderTiebreak: Column): DataFrame = {
    require(n >= 2, s"paths needs n >= 2, got $n")
    val w = Window.partitionBy(col("id")).orderBy(col("stamp"), orderTiebreak)
    val steps = col("event") +: (1 until n).map(i => lead(col("event"), i).over(w))
    val withSteps = events.select(col("id") +:
      steps.zipWithIndex.map { case (c, i) => c.as(s"__e$i") }: _*)
    withSteps
      .where((1 until n).map(i => col(s"__e$i").isNotNull).reduce(_ && _))
      .select(col("id"),
        concat_ws(">", (0 until n).map(i => col(s"__e$i")): _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"), countDistinct(col("id")).as("customers"))
  }

  /** Last-touch attribution: each conversion event is credited to the most
    * recent preceding touch event of the same person (`'direct'` when none
    * exists). The marketing-analytics counterpart of the reference's
    * backward scan (`.look_back` iteration,
    * `src/queryinterpreter.cpp:2460-2533`), expressed as one
    * last-non-null-over-preceding-rows window — a single sort-shuffle on
    * `id`, no self-join. Returns per-channel conversion counts, distinct
    * converters, and exact attributed value. */
  def lastTouchAttribution(events: DataFrame, conversionEvent: String,
                           touchEvents: Seq[String],
                           orderTiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("stamp"), orderTiebreak)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(
      when(col("event").isin(touchEvents: _*), col("event")),
      ignoreNulls = true).over(w)
    events
      .withColumn("__touch", touch)
      .where(col("event") === conversionEvent)
      .groupBy(coalesce(col("__touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct(col("id")).as("customers"),
        graft.functions.AggFns.dsum(col("value")).as("attributed_value"))
  }

  /** RFM segmentation: per converting person, recency (whole days since
    * their last `conversionEvent` at `nowMs`), frequency (conversion count)
    * and monetary (exact-decimal value sum) — classed by fixed business
    * thresholds and counted per (r, f, m) cell. The classic behavioral
    * segmentation the reference expresses as three segment scripts; here
    * one groupBy(id) + one tiny class aggregation, both map-side partial —
    * no windows, no per-metric global sort (quantile-based RFM would need
    * one; fixed thresholds are the shape that scales). */
  def rfm(events: DataFrame, conversionEvent: String, nowMs: Long,
          recencyDayCuts: (Int, Int) = (7, 30),
          freqCuts: (Long, Long) = (3L, 10L),
          moneyCuts: (Double, Double) = (100.0, 500.0)): DataFrame = {
    val conv = events.where(col("event") === conversionEvent)
    val per = conv.groupBy(col("id")).agg(
        max(col("stamp")).as("last_ms"),
        count(lit(1)).as("freq"),
        graft.functions.AggFns.dsum(col("value")).as("money"))
      // integer day floor — a double-division route can round up at the
      // precision edge and disagree with the SQL oracle's floor
      .withColumn("recency_days", expr(s"($nowMs - last_ms) div 86400000"))
    val r = when(col("recency_days") <= recencyDayCuts._1, "recent")
      .when(col("recency_days") <= recencyDayCuts._2, "warm").otherwise("lapsed")
    val f = when(col("freq") >= freqCuts._2, "high")
      .when(col("freq") >= freqCuts._1, "mid").otherwise("low")
    val m = when(col("money") >= moneyCuts._2, "high")
      .when(col("money") >= moneyCuts._1, "mid").otherwise("low")
    per.groupBy(r.as("r"), f.as("f"), m.as("m"))
      .agg(count(lit(1)).as("customers"),
        graft.functions.AggFns.dsum(col("money")).as("total_value"))
  }

  /** As-of join: attach to each left row the payload of the latest right row
    * of the same key with `rightTime <= leftTime` (backward inclusive) — the
    * time-series correlation primitive (DuckDB ASOF JOIN / pandas
    * merge_asof), the relational form of the reference's backward cursor
    * scan (`.look_back`, `src/queryinterpreter.cpp:2460-2533`).
    *
    * Spark-first: a direct range join would plan as a broadcast-nested-loop
    * or an exploding theta join. Instead tag and UNION both sides, sort once
    * per key, and carry the right payload forward with
    * `last(ignoreNulls)` over preceding rows — one shuffle + one sort on the
    * key, linear in rows, AQE-skew-splittable at any scale.
    *
    * Right payload columns arrive as `prefix+name`; left rows with no prior
    * right row keep nulls (left-join semantics). With `toleranceMs`, matches
    * older than `leftTime - tolerance` are nulled. Make `(key, rightTime)`
    * unique on the right (pre-aggregate) — ties are otherwise arbitrary,
    * same as SQL ASOF. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, payload: Seq[String],
               prefix: String = "asof_",
               toleranceMs: Option[Long] = None): DataFrame = {
    val rPay = (rightTime +: payload).distinct
    val lSide = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lFull = rPay.foldLeft(lSide)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val rSide = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
        rPay.map(c => col(c).as(s"__r_$c")): _*)
    // right rows carry nulls for every non-key left column
    val rFull = left.columns.filterNot(_ == key).foldLeft(rSide)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lFull.unionByName(rFull.select(lFull.columns.map(col): _*))
    // side 0 (right) sorts before side 1 (left) at equal time -> inclusive >=
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rPay.foldLeft(unioned)((df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    val matched = carried.where(col("__side") === 1)
    val tol = toleranceMs.map { t =>
      col(s"$prefix$rightTime").isNotNull &&
        col("__t") - col(s"$prefix$rightTime") <= t
    }.getOrElse(lit(true))
    val out = rPay.foldLeft(matched)((df, c) =>
      df.withColumn(s"$prefix$c", when(tol, col(s"$prefix$c"))))
    out.select(left.columns.map(col) ++ rPay.map(c => col(s"$prefix$c")): _*)
  }

  /** Hierarchical tally (`<<` operator, `src/queryinterpreter.cpp:167-334`):
    * every prefix of the group path aggregates, with distinct-per-person
    * counting at each node. Spark-native: `rollup` over the path columns +
    * `countDistinct(id)` (SURVEY §2.4 — the tally tree IS a rollup). */
  def tallyRollup(events: DataFrame, path: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.rollup(path: _*).agg(aggs.head, aggs.tail: _*)

  /** Top-k children per tree node after sort — the `trim` parameter
    * (`src/result.cpp:1038-1044`). `parent` are the grouping columns of the
    * parent node, `rankBy` the sort column (descending, id-asc tiebreak for
    * determinism). */
  def trim(grouped: DataFrame, parent: Seq[String], rankBy: Column, tieBreak: Column, k: Int): DataFrame =
    grouped
      .withColumn("__rk", row_number().over(
        Window.partitionBy(parent.map(col): _*).orderBy(rankBy.desc, tieBreak.asc)))
      .where(col("__rk") <= k)
      .drop("__rk")
}

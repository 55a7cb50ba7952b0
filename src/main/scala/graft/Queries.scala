package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AggFns._
import graft.functions.TimeFns
import graft.operators.{EventOps, Segments}

/** The operator registry: every SURVEY §2 capability exposed as a named query
  * over the driver's test tables, each paired (where SQL-expressible) with an
  * ANSI-SQL oracle the driver runs in DuckDB.
  *
  * Oracle-parity rules (see AggFns): double sums go through DECIMAL(28,4);
  * day-of-week in DuckDB is `dayofweek(ts)+1` (Spark: 1=Sunday); event
  * stamps are epoch millis via integer division of the raw nanos
  * (= DuckDB `epoch_ms`).
  */
object Queries {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = true)

  /** Shared oracle CTE: OpenSet-normalized event stream (Tables.events). */
  private val E = "WITH e AS (SELECT user_id AS id, epoch_ms(ts) AS stamp, event_type AS event, value, event_id FROM events)"

  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(28,4))) AS DOUBLE)"
  private def dsumSql(expr: String) = DSUM.format(expr)

  val registry: Seq[Q] = Seq(

    // ---------------------------------------------------------------- relational
    Q("q_lineitem_pricing",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_mktsegment_orders",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"),
            countDistinct(col("o_custkey")).as("n_customers"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS revenue,
        COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    Q("q_region_nation_rollup",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("acctbal"))
      },
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
        ${dsumSql("c_acctbal")} AS acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)""")),

    Q("q_top_order_per_customer",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_top_orders"), dsum(col("o_totalprice")).as("top_value"))
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_top_orders,
        ${dsumSql("o_totalprice")} AS top_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        WHERE rn = 1 GROUP BY o_orderstatus""")),

    // ------------------------------------------------- event analytics (OpenSet)
    // Property-count endpoint on `event` (src/oloop_property.cpp:34-307).
    Q("q_event_type_counts",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("event"))
          .agg(
            countDistinct(col("id")).as("customers"),
            count(lit(1)).as("n_rows"),
            dsum(col("value")).as("total_value"))
      },
      Some(s"""$E SELECT event, COUNT(DISTINCT id) AS customers, COUNT(*) AS n_rows,
        ${dsumSql("value")} AS total_value FROM e GROUP BY event""")),

    // Bucketed property count (`bucket` param, src/oloop_property.cpp:139-168).
    Q("q_value_bucket_counts",
      (s, dir) => {
        val e = Tables.events(s, dir)
        EventOps.propertyCountsBucketed(e, col("value"), 50.0)
      },
      Some(s"""$E SELECT FLOOR(value / 50.0) * 50.0 AS bucket,
        COUNT(DISTINCT id) AS customers FROM e GROUP BY 1""")),

    // Session assignment + session_count (src/grid.cpp:515-522; 30-min gap).
    Q("q_sessions_per_user",
      (s, dir) => {
        val e = Tables.events(s, dir)
        EventOps.sessionize(e)
          .groupBy(col("id"))
          .agg(max(col("session")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some(s"""$E, l AS (
          SELECT id, stamp,
            CASE WHEN stamp - LAG(stamp) OVER (PARTITION BY id ORDER BY stamp) > 1800000
                 THEN 1 ELSE 0 END AS isnew
          FROM e),
        se AS (
          SELECT id, SUM(isnew) OVER (PARTITION BY id ORDER BY stamp ROWS UNBOUNDED PRECEDING) + 1 AS session
          FROM l)
        SELECT id, MAX(session) AS n_sessions, COUNT(*) AS n_events FROM se GROUP BY id""")),

    // Funnel: first signup -> first purchase within 7 days
    // (nested each_row.continue().next(), src/queryinterpreter.cpp:2430-2577).
    Q("q_funnel_signup_purchase",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val f = EventOps.funnel2(e, "signup", "purchase", TimeFns.days(7))
        f.agg(
          count(col("first_from")).as("n_entered"),
          count(col("first_to_after")).as("n_converted"))
      },
      Some(s"""$E, f AS (
          SELECT id,
            MIN(CASE WHEN event = 'signup' THEN stamp END) AS first_from
          FROM e GROUP BY id),
        c AS (
          SELECT f.id, MIN(e.stamp) AS first_to
          FROM f JOIN e ON e.id = f.id AND e.event = 'purchase'
            AND e.stamp >= f.first_from AND e.stamp <= f.first_from + 604800000
          GROUP BY f.id)
        SELECT (SELECT COUNT(first_from) FROM f) AS n_entered,
               (SELECT COUNT(*) FROM c) AS n_converted""")),

    // .ever / .never modifiers (src/queryinterpreter.cpp:2580-2720).
    Q("q_ever_error_never_signup",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("id"))
          .agg(
            count(when(col("event") === "error", 1)).as("n_err"),
            count(when(col("event") === "signup", 1)).as("n_sign"))
          .where(col("n_err") > 0 && col("n_sign") === 0)
          .agg(count(lit(1)).as("n_customers"))
      },
      Some(s"""$E SELECT COUNT(*) AS n_customers FROM (
        SELECT id FROM e GROUP BY id
        HAVING COUNT(CASE WHEN event = 'error' THEN 1 END) > 0
           AND COUNT(CASE WHEN event = 'signup' THEN 1 END) = 0)""")),

    // Hierarchical tally `<<` by (day-of-week, event): every prefix aggregates
    // with distinct-person counts (src/queryinterpreter.cpp:167-334 -> rollup).
    Q("q_dow_event_tally",
      (s, dir) => {
        val e = Tables.events(s, dir)
        EventOps.tallyRollup(
          e.withColumn("dow", TimeFns.getDayOfWeek(col("stamp"))),
          Seq(col("dow"), col("event")),
          Seq(countDistinct(col("id")).as("customers"),
              count(lit(1)).as("n_rows"),
              dsum(col("value")).as("total_value")))
      },
      Some(s"""$E SELECT dayofweek(make_timestamp(stamp * 1000)) + 1 AS dow, event,
        COUNT(DISTINCT id) AS customers, COUNT(*) AS n_rows, ${dsumSql("value")} AS total_value
        FROM e GROUP BY ROLLUP(dow, event)""")),

    // trim/top-k per tree node (src/result.cpp:1038-1044).
    Q("q_top2_events_per_dow",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val grouped = e.withColumn("dow", TimeFns.getDayOfWeek(col("stamp")))
          .groupBy(col("dow"), col("event"))
          .agg(count(lit(1)).as("n_rows"))
        EventOps.trim(grouped, Seq("dow"), col("n_rows"), col("event"), 2)
      },
      Some(s"""$E, g AS (
          SELECT dayofweek(make_timestamp(stamp * 1000)) + 1 AS dow, event, COUNT(*) AS n_rows
          FROM e GROUP BY 1, 2)
        SELECT dow, event, n_rows FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY dow ORDER BY n_rows DESC, event ASC) AS rk FROM g)
        WHERE rk <= 2""")),

    // Single-customer history fetch (GET /v1/query/{table}/customer).
    Q("q_customer_history",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.where(col("id") === 7)
          .select(col("event_id"), col("stamp"), col("event"), col("value"))
      },
      Some(s"""$E SELECT event_id, stamp, event, value FROM e WHERE id = 7""")),

    // Person stats: first_stamp/last_stamp/row_count/distinct events
    // (src/queryinterpreter.cpp:1259-1352).
    Q("q_person_stats",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("id"))
          .agg(
            min(col("stamp")).as("first_stamp"),
            max(col("stamp")).as("last_stamp"),
            count(lit(1)).as("row_count"),
            countDistinct(col("event")).as("n_event_types"))
      },
      Some(s"""$E SELECT id, MIN(stamp) AS first_stamp, MAX(stamp) AS last_stamp,
        COUNT(*) AS row_count, COUNT(DISTINCT event) AS n_event_types
        FROM e GROUP BY id""")),

    // stamp_counts mode: distinct stamps as the count key
    // (src/rpc_query.cpp:329,388; src/queryinterpreter.cpp:249-251).
    Q("q_stamp_counts",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("event"))
          .agg(countDistinct(col("stamp")).as("distinct_stamps"))
      },
      Some(s"""$E SELECT event, COUNT(DISTINCT stamp) AS distinct_stamps FROM e GROUP BY event""")),

    // Segments: materialization + population + full set algebra
    // (src/oloop_segment.cpp; src/queryinterpreter.cpp:624-888).
    Q("q_segment_algebra",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val high = Segments.fromAggPredicate(
          e, Seq(dsum(when(col("event") === "purchase", col("value"))).as("pv")),
          col("pv") > 600.0)
        val active = Segments.fromAggPredicate(
          e, Seq(count(lit(1)).as("c")), col("c") >= 70L)
        val universe = e.select("id").distinct()
        val rows = Seq(
          ("high_value", high), ("active", active),
          ("intersection", Segments.intersection(high, active)),
          ("union", Segments.union(high, active)),
          ("difference", Segments.difference(high, active)),
          ("compliment", Segments.compliment(universe, high)))
        rows.map { case (nm, seg) =>
          seg.agg(count(lit(1)).as("population")).select(lit(nm).as("segment"), col("population"))
        }.reduce(_ union _)
      },
      Some(s"""$E, high AS (
          SELECT id FROM e GROUP BY id
          HAVING ${dsumSql("CASE WHEN event = 'purchase' THEN value END")} > 600.0),
        active AS (SELECT id FROM e GROUP BY id HAVING COUNT(*) >= 70),
        uni AS (SELECT DISTINCT id FROM e)
        SELECT 'high_value' AS segment, COUNT(*) AS population FROM high
        UNION ALL SELECT 'active', COUNT(*) FROM active
        UNION ALL SELECT 'intersection', COUNT(*) FROM (SELECT id FROM high INTERSECT SELECT id FROM active)
        UNION ALL SELECT 'union', COUNT(*) FROM (SELECT id FROM high UNION SELECT id FROM active)
        UNION ALL SELECT 'difference', COUNT(*) FROM (SELECT id FROM high EXCEPT SELECT id FROM active)
        UNION ALL SELECT 'compliment', COUNT(*) FROM (SELECT id FROM uni EXCEPT SELECT id FROM high)""")),

    // Segment-compare mode (`segments=a,b` -> per-segment result columns,
    // src/oloop_query.cpp:69-107): conditional agg per membership flag.
    Q("q_segment_compare",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val high = Segments.fromAggPredicate(
          e, Seq(dsum(when(col("event") === "purchase", col("value"))).as("pv")),
          col("pv") > 600.0)
        val tagged = Segments.compareColumns(e, Map("high" -> high))
        tagged.groupBy(col("event"))
          .agg(
            countDistinct(col("id")).as("customers_all"),
            countDistinct(when(col("in_high"), col("id"))).as("customers_high"))
      },
      Some(s"""$E, high AS (
          SELECT id FROM e GROUP BY id
          HAVING ${dsumSql("CASE WHEN event = 'purchase' THEN value END")} > 600.0)
        SELECT event, COUNT(DISTINCT e.id) AS customers_all,
          COUNT(DISTINCT CASE WHEN high.id IS NOT NULL THEN e.id END) AS customers_high
        FROM e LEFT JOIN high ON e.id = high.id GROUP BY event"""))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def benchNames: Seq[String] = registry.filter(_.bench).map(_.name)
}

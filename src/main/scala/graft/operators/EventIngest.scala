package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event ingest semantics from the reference's insert path
  * (`src/grid.cpp:761-1369`, `src/rpc_insert.cpp`): JSON parse with schema
  * coercion, stamp normalization, z-order tie-breaking, row-hash
  * deduplication/upsert, and retention culling (eventMax / TTL).
  *
  * All functions are batch DataFrame transforms so they compose with
  * Structured Streaming `foreachBatch` (see [[graft.streaming.Streams]]).
  */
object EventIngest {

  /** Parse raw JSON event objects (one per row in `jsonCol`) against an
    * explicit schema. Unknown keys are ignored (schema-driven), missing keys
    * are null — `src/grid.cpp:769-773`. */
  def parseJson(raw: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    raw.select(from_json(col(jsonCol), schema).as("e")).select("e.*")

  /** Stamp normalization (`Epoch::fixMilli`, `src/grid.cpp:1217-1220`):
    * integers that look like epoch-seconds (< 1e11) are promoted to millis;
    * ISO8601 strings are parsed. Accepts a string or numeric column. */
  def normalizeStamp(stamp: Column): Column = {
    // try_cast: ANSI mode (Spark 4 default) makes cast throw on ISO strings
    val asLong = stamp.cast("string").try_cast("long")
    when(asLong.isNotNull && asLong < 100000000000L, asLong * 1000)
      .when(asLong.isNotNull, asLong)
      .otherwise(unix_millis(to_timestamp(stamp.cast("string"))))
  }

  /** Z-order rank from the table's `event_order` list (`src/table.cpp:138-146`):
    * listed events rank by position, everything else rank 99. Rows sharing a
    * stamp order by this rank. */
  def eventRank(event: Column, eventOrder: Seq[String]): Column =
    eventOrder.zipWithIndex.foldRight(lit(99): Column) { case ((name, rank), acc) =>
      when(event === name, lit(rank)).otherwise(acc)
    }

  /** Row content hash over the event's payload columns
    * (`src/grid.cpp:1232-1258`): drives replace-on-duplicate. */
  def rowHash(payloadCols: Seq[Column]): Column =
    md5(concat_ws("\u0001", payloadCols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Upsert semantics (`src/grid.cpp:1306-1364`): an incoming event replaces
    * an existing row when (id, stamp, event-rank, row-hash) match; otherwise
    * it merge-sorts into the history. `existing` and `incoming` must share a
    * schema; payload columns define the row hash. Latest batch wins.
    *
    * The EVENT NAME is always part of the row hash — in the reference's
    * grid the event is itself a row attribute covered by the content hash,
    * so two DIFFERENT events at one stamp with identical payloads are two
    * rows. Hashing the payload alone collapsed them whenever both events
    * shared the default z-rank (unlisted in event_order) — a silent
    * data-loss hole found by StoreDifferentialSpec (round 16). */
  def upsert(existing: DataFrame, incoming: DataFrame,
             eventOrder: Seq[String], payload: Seq[String]): DataFrame = {
    val tagged = existing.withColumn("__gen", lit(0))
      .unionByName(incoming.withColumn("__gen", lit(1)))
    val hashCols = if (payload.contains("event")) payload else "event" +: payload
    val keyed = tagged
      .withColumn("__rank", eventRank(col("event"), eventOrder))
      .withColumn("__rh", rowHash(hashCols.map(col)))
    val w = Window
      .partitionBy(col("id"), col("stamp"), col("__rank"), col("__rh"))
      .orderBy(col("__gen").desc)
    keyed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__gen", "__rank", "__rh", "__rn")
  }

  /** Retention: keep the most recent `eventMax` rows per person
    * (`src/table.h:122`, default 5000; `src/grid.cpp:698-750`). */
  def cullEventMax(events: DataFrame, eventMax: Int,
                   eventOrder: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("stamp").desc, eventRank(col("event"), eventOrder).desc)
    events.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= eventMax)
      .drop("__rn")
  }

  /** Retention: drop rows older than `ttlMs` before `nowMs`
    * (`src/table.h:123`, default 5 years). */
  def cullTtl(events: DataFrame, nowMs: Long, ttlMs: Long): DataFrame =
    events.where(col("stamp") >= nowMs - ttlMs)

  /** Read-side ordering: the canonical per-person event order
    * (stamp, z-order rank) — `src/grid.cpp:1261-1270`. */
  def ordered(events: DataFrame, eventOrder: Seq[String]): DataFrame =
    events.orderBy(col("id"), col("stamp"), eventRank(col("event"), eventOrder))
}

/** Customer-property (is_customer) semantics: person-level facts readable in
  * queries and writable back from scripts (`src/queryinterpreter.cpp:
  * 3116-3264`, SURVEY §2.3 "Customer-props enrichment"). */
object CustomerProps {

  /** Enrich events with person-level properties (broadcast when small —
    * person-prop tables are ids + a few columns). */
  def enrich(events: DataFrame, props: DataFrame, broadcastProps: Boolean = true): DataFrame = {
    val p = if (broadcastProps) broadcast(props) else props
    events.join(p, Seq("id"), "left")
  }

  /** Write-back merge: `updates(id, …)` overwrite matching columns of
    * `props`; new ids append (the MERGE the reference performs when a script
    * assigns a customer property). */
  def writeBack(props: DataFrame, updates: DataFrame): DataFrame = {
    val cols = props.columns
    val u = updates.withColumn("__new", lit(1))
    props.withColumn("__new", lit(0))
      .unionByName(u, allowMissingColumns = true)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("__new").desc)))
      .where(col("__rn") === 1)
      .select(cols.map(col): _*)
  }
}

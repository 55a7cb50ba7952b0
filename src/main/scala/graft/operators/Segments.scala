package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenSet segments re-expressed as membership DataFrames.
  *
  * A segment in the reference is a per-customer boolean materialized as a
  * bitmap over linear customer ids (`src/tablepartitioned.h:29-85`), with set
  * algebra marshals `population / intersection / union / compliment /
  * difference` (`src/queryinterpreter.cpp:624-888`). Here a segment is a
  * DataFrame of distinct `id` rows; algebra maps to semi/anti joins and
  * DISTINCT unions, which Catalyst executes as hash joins with partial
  * aggregation — the 100 TB-safe shape (no driver-side bitmaps; RoaringBitmap
  * aggregators are an optional later optimization, SURVEY §7.3).
  */
object Segments {

  /** Materialize a segment from a person-level predicate over the event
    * stream: persons having ≥1 row matching `rowCond`. */
  def fromRowPredicate(events: DataFrame, rowCond: Column): DataFrame =
    events.where(rowCond).select("id").distinct()

  /** Materialize a segment from a person-level aggregate predicate, e.g.
    * `sum(value) > 1000` (full-scan segment scripts,
    * `src/oloop_segment.cpp:352-358`). `aggCond` must reference aggregated
    * columns of `byPerson`. */
  def fromAggPredicate(events: DataFrame, aggs: Seq[Column], aggCond: Column): DataFrame =
    events.groupBy("id").agg(aggs.head, aggs.tail: _*).where(aggCond).select("id")

  /** population(segment) — distinct-person count (`src/oloop_segment.cpp:47-68`). */
  def population(segment: DataFrame): Long = segment.count()

  def intersection(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id"), "left_semi")

  def union(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).distinct()

  /** difference(a, b): in a, not in b. */
  def difference(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, Seq("id"), "left_anti")

  /** compliment(universe, a) [sic — reference spelling]: persons not in a. */
  def compliment(universe: DataFrame, a: DataFrame): DataFrame =
    difference(universe, a)

  // ------------------------------------------------------------ bitmap tier
  /** Aggregate a membership DataFrame into one compact [[graft.functions
    * .IdBitmap]] — the reference's segment representation
    * (`src/tablepartitioned.h:29-85`). Partial bitmaps build per partition
    * and OR-merge, so the shuffle carries chunk images, not id rows. Use for
    * repeated segment algebra over the same segments: popcount and
    * AND/OR/ANDNOT run in microseconds with no further scans or joins
    * (`src/queryinterpreter.cpp:624-888` — the reference short-circuits
    * whole-segment math the same way). */
  /** The guarded bitmap-index cast shared by every bitmap builder: null ids
    * stay null (no membership), a non-castable string or negative id raises
    * a CLEAR error instead of an executor-side require / silent drop. */
  private def guardedIdAsLong(df: DataFrame): Column = {
    import org.apache.spark.sql.types._
    val asLong: Column = df.schema("id").dataType match {
      case LongType | IntegerType | ShortType | ByteType => col("id").cast("long")
      // ANSI-safe: try_cast turns non-numeric text into null (flagged below
      // with a clear error) instead of an opaque runtime cast exception.
      case StringType => expr("try_cast(id AS BIGINT)")
      case t => throw new IllegalArgumentException(
        s"unsupported id type $t for bitmap segments (need integral or numeric text)")
    }
    when(col("id").isNull, lit(null).cast("long"))
      .when(asLong.isNull || asLong < 0, raise_error(concat(
        lit("id not bitmap-indexable (need non-negative integral): "),
        col("id").cast("string"))).cast("long"))
      .otherwise(asLong)
  }

  def membershipBitmap(segment: DataFrame): graft.functions.IdBitmap = {
    import org.apache.spark.sql.Encoders
    val bytes = segment.select(guardedIdAsLong(segment).as("id"))
      .where(col("id").isNotNull) // null ids have no membership
      .as(Encoders.scalaLong)
      .select(graft.functions.IdBitmap.agg)
      .head()
    graft.functions.IdBitmap.deserialize(bytes)
  }

  /** Build SEVERAL segment bitmaps in ONE aggregation pass: `flags` maps
    * segment name → membership predicate over `perPerson` (one row per
    * person, carrying an integral `id`). Each predicate contributes
    * `when(pred, id)` to a shared agg, so the person frame is scanned once
    * and the driver receives one row of serialized bitmaps — versus one
    * full scan + collect PER segment with repeated [[membershipBitmap]]
    * calls (measured 3 jobs → 1 on the segment-algebra registry query).
    * Null ids carry no membership, exactly as [[membershipBitmap]]. */
  def membershipBitmaps(perPerson: DataFrame, flags: Seq[(String, Column)])
      : Map[String, graft.functions.IdBitmap] = {
    require(flags.nonEmpty, "need at least one segment predicate")
    // same guarded cast as membershipBitmap: a bare cast would fail negative
    // ids via an obscure executor-side require and silently DROP non-numeric
    // string ids from every segment (including the universe)
    val idAsLong = guardedIdAsLong(perPerson)
    val aggs = flags.map { case (name, pred) =>
      graft.functions.IdBitmap.colAgg(
        when(pred, idAsLong)).as(s"__bm_$name")
    }
    val row = perPerson.agg(aggs.head, aggs.tail: _*).head()
    flags.zipWithIndex.map { case ((name, _), i) =>
      name -> graft.functions.IdBitmap.deserialize(row.getAs[Array[Byte]](i))
    }.toMap
  }

  /** Segment-compare mode (`segments=` query param,
    * `src/oloop_query.cpp:69-107`): tag each event row with membership flags
    * so downstream aggregations can produce per-segment columns without
    * re-scanning. `segments` maps name → membership DF. Uses left-semi-style
    * joins folded into one pass via left joins on distinct ids. */
  def compareColumns(events: DataFrame, segments: Map[String, DataFrame]): DataFrame =
    segments.foldLeft(events) { case (df, (name, seg)) =>
      df.join(seg.withColumn(s"__in_$name", lit(1)), Seq("id"), "left")
        .withColumn(s"in_$name", coalesce(col(s"__in_$name"), lit(0)) === 1)
        .drop(s"__in_$name")
    }
}

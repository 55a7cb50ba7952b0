package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k per group as a typed Aggregator — the scale path for
  * per-key top-k.
  *
  * The window-rank form (`row_number over (partition by key order by ord)`)
  * sorts EVERY row of a key on one reducer before discarding all but k. This
  * aggregator's partial buffer never holds more than k entries, so map-side
  * combine collapses each partition to ≤ k rows per key BEFORE the shuffle —
  * the exchange carries `keys × k` entries instead of the table, and no
  * per-key sort of the full history ever happens. Same trade Spark applies
  * internally for global `takeOrdered`; this makes it available per group.
  *
  * Deterministic: entries order by (ord DESC, payload ASC) — both total —
  * so results are reproducible and SQL-oracle-comparable against the
  * window-rank form. */
object TopK {

  /** One ranked entry: the ordering value and an id-like payload. */
  final case class Entry(ord: Double, payload: Long)

  private val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.ord, e.payload))

  /** `topK(k)(ordCol, payloadCol)` aggregates to the k top entries as
    * `array<struct<ord, payload>>`, highest `ord` first. */
  def topK(k: Int): UserDefinedFunction = {
    require(k > 0, s"k must be positive, got $k")
    udaf(new Agg(k))
  }

  private final class Agg(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    def zero: Seq[Entry] = Nil
    def reduce(b: Seq[Entry], e: Entry): Seq[Entry] =
      // cheap cap: below-threshold rows never allocate once the buffer is
      // full (the common case after the first k rows of a partition)
      if (b.length == k && ord.lteq(b.last, e)) b
      else (e +: b).sorted(ord).take(k)
    def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
      (x ++ y).sorted(ord).take(k)
    def finish(r: Seq[Entry]): Seq[Entry] = r.sorted(ord)
    def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }
}

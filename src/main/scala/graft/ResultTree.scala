package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Assembles the reference's hierarchical JSON result shape from the flat
  * `(depth, g1..g8, agg…)` node rows produced by `OslEngine.query` (or any
  * rollup): nested objects with `g` (group label), `c` (aggregate array) and
  * `_` (children), with per-branch sort and top-k trim —
  * `src/result.cpp:565-778` (tree), `:944-1036` (sort), `:1038-1044` (trim).
  *
  * Driver-side by design: the tree is a presentation format; everything
  * up to here stayed distributed and the node count is bounded by the
  * grouping cardinality, not the data size.
  */
object ResultTree {

  final case class Node(g: Any, c: Seq[Any], children: Seq[Node]) {
    def toJson: String = {
      val sb = new StringBuilder
      write(sb)
      sb.toString
    }
    private def write(sb: StringBuilder): Unit = {
      sb.append("{\"g\":").append(jsonVal(g))
        .append(",\"c\":[").append(c.map(jsonVal).mkString(",")).append("]")
      if (children.nonEmpty) {
        sb.append(",\"_\":[")
        var first = true
        children.foreach { ch =>
          if (!first) sb.append(",")
          first = false
          ch.write(sb)
        }
        sb.append("]")
      }
      sb.append("}")
    }
  }

  private def jsonVal(a: Any): String = a match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case d: Double => if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case other => other.toString
  }

  /** Build the tree honoring an OSL `sort` section: `group` sorts by group
    * label, anything else by the named aggregate column
    * (src/rpc_query.cpp:330-341, src/result.cpp:944-1036). */
  def fromProgramSort(df: DataFrame, aggCols: Seq[String],
                      sort: Seq[graft.osl.Ast.SortSpec],
                      trim: Int = 0): Seq[Node] =
    sort.headOption match {
      case Some(s) if s.column == "group" =>
        fromNodeRows(df, aggCols, ascending = s.ascending, trim = trim, byGroup = true)
      case Some(s) =>
        val idx = math.max(0, aggCols.indexOf(s.column))
        fromNodeRows(df, aggCols, sortCol = idx, ascending = s.ascending, trim = trim)
      case None => fromNodeRows(df, aggCols, trim = trim)
    }

  /** Build the tree from node rows. `aggCols` names the aggregate columns in
    * `c`-array order; `sortBy` is an index into aggCols (None = first),
    * descending by default; `trim` keeps top-k children per node (0 = all);
    * `byGroup` sorts by group label instead of an aggregate. */
  /** Plan-side top-k pre-trim (round-17 #3): when the tree will keep only
    * `trim` children per node, filter rank-≤-trim PER PARENT PATH in the
    * PLAN, cascading level by level (children of trimmed parents drop too),
    * so the driver collect receives ≤ Σ kept-nodes rows instead of the full
    * grouping cardinality — the reference merges full trees then trims
    * (src/result.cpp:1038), but Spark can do better. The rank key mirrors
    * the driver sort exactly: sort-aggregate cast to double with null →
    * −∞ (Spark and TotalOrdering agree NaN is greatest in both
    * directions), ties broken by the child label ascending — labels are
    * UNIQUE per parent (node rows key by path), so the rank is total and
    * the kept set is bit-identical to the driver-side trim. */
  private[graft] def pruneForTrim(df: DataFrame, aggCols: Seq[String],
                                  sortCol: Int, ascending: Boolean,
                                  trim: Int, byGroup: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxDepth = graft.osl.OslEngine.MaxDepth
    var kept = Vector.empty[DataFrame]
    for (d <- 1 to maxDepth) {
      val parentCols = (1 until d).map(i => s"g$i")
      val w0 =
        if (parentCols.isEmpty) Window.partitionBy(lit(1))
        else Window.partitionBy(parentCols.map(col): _*)
      val orderCols: Seq[Column] =
        if (byGroup) Seq(if (ascending) col(s"g$d").asc else col(s"g$d").desc)
        else {
          val k = coalesce(col(aggCols(sortCol)).cast("double"),
            lit(Double.NegativeInfinity))
          Seq(if (ascending) k.asc else k.desc, col(s"g$d").asc)
        }
      var level = df.where(col("depth") === d)
      if (d > 1) {
        // survivors only: parents the previous level kept (null-safe on the
        // path columns); the parent frame is ≤ kept-node-sized — broadcast
        val parents = kept(d - 2).select(parentCols.map(col): _*)
          .dropDuplicates(parentCols)
        val cond = parentCols.map(c => level(c) <=> parents(c)).reduce(_ && _)
        level = level.join(broadcast(parents), cond, "left_semi")
      }
      kept :+= level
        .withColumn("__rk", row_number().over(w0.orderBy(orderCols: _*)))
        .where(col("__rk") <= trim).drop("__rk")
    }
    kept.reduce(_ unionByName _)
  }

  def fromNodeRows(df: DataFrame, aggCols: Seq[String],
                   sortCol: Int = 0, ascending: Boolean = false,
                   trim: Int = 0, byGroup: Boolean = false): Seq[Node] = {
    val maxDepth = graft.osl.OslEngine.MaxDepth
    // pushdown needs a plan-expressible rank key: the label (byGroup) or a
    // NUMERIC sort aggregate (the driver's fallback for other types is
    // String.hashCode — not reproducible in-plan, so those trees collect
    // whole, as before)
    val canPush = trim > 0 && (byGroup ||
      (aggCols.nonEmpty && df.schema(aggCols(math.max(0, math.min(sortCol,
        aggCols.length - 1)))).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]))
    val src =
      if (canPush) pruneForTrim(df, aggCols, sortCol, ascending, trim, byGroup)
      else df
    val rows = src.collect()
    val byPath: Map[Vector[String], Row] = rows.map { r =>
      val depth = r.getInt(r.fieldIndex("depth"))
      val path = (1 to depth).map(i =>
        Option(r.get(r.fieldIndex(s"g$i"))).map(_.toString).getOrElse("")).toVector
      path -> r
    }.toMap

    def aggs(r: Row): Seq[Any] = aggCols.map(c => r.get(r.fieldIndex(c)))

    def sortKey(n: Node): Double = n.c(sortCol) match {
      case null => Double.NegativeInfinity
      case x: Number => x.doubleValue()
      case other => other.toString.hashCode.toDouble
    }

    def build(path: Vector[String]): Seq[Node] = {
      val depth = path.length + 1
      if (depth > maxDepth) return Nil
      val childRows = byPath.filter { case (p, _) =>
        p.length == depth && p.startsWith(path)
      }
      var nodes = childRows.map { case (p, r) =>
        Node(p.last, aggs(r), build(p))
      }.toSeq
      nodes =
        if (byGroup) {
          val sorted = nodes.sortBy(_.g.toString)
          if (ascending) sorted else sorted.reverse
        } else {
          // label tiebreak (ascending) makes equal-key order deterministic
          // — and identical to the plan-side pre-trim's rank order
          val keyOrd =
            if (ascending) Ordering.Double.TotalOrdering
            else Ordering.Double.TotalOrdering.reverse
          nodes.sortBy(n => (sortKey(n), n.g.toString))(
            Ordering.Tuple2(keyOrd, Ordering.String))
        }
      if (trim > 0) nodes.take(trim) else nodes
    }

    build(Vector.empty)
  }

  /** Zero-fill a histogram axis (`src/result.cpp:780-942`): ensure a node
    * exists for every bucket in [lo, hi] step `size`, inserting zeroed
    * aggregate arrays where absent. Buckets render like the engine's
    * canonical group keys (integers without trailing .0). */
  def zeroFill(nodes: Seq[Node], lo: Double, hi: Double, size: Double,
               nAggs: Int): Seq[Node] = {
    val existing = nodes.map(n => n.g.toString -> n).toMap
    val buckets = Iterator.iterate(lo)(_ + size).takeWhile(_ <= hi).toSeq
    buckets.map { b =>
      val key = if (b == b.floor) b.toLong.toString else b.toString
      existing.getOrElse(key, Node(key, Seq.fill(nAggs)(0L), Nil))
    }
  }

  def toJson(nodes: Seq[Node]): String =
    "{\"_\":[" + nodes.map(_.toJson).mkString(",") + "]}"
}

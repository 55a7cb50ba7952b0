package graft

import org.apache.spark.sql.{DataFrame, Row}

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
  def fromNodeRows(df: DataFrame, aggCols: Seq[String],
                   sortCol: Int = 0, ascending: Boolean = false,
                   trim: Int = 0, byGroup: Boolean = false): Seq[Node] = {
    val maxDepth = graft.osl.OslEngine.MaxDepth
    val rows = df.collect()
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
        } else nodes.sortBy(sortKey)(
          if (ascending) Ordering.Double.TotalOrdering
          else Ordering.Double.TotalOrdering.reverse)
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

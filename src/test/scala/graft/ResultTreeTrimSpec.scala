package graft

import org.apache.spark.sql.functions._

/** Round-17 #3: `trim` applies IN THE PLAN before ResultTree's driver
  * collect — a tally keyed by a high-cardinality column must collect only
  * the kept nodes, and the tree must be byte-identical to the full-collect
  * path. */
class ResultTreeTrimSpec extends SparkSpec {
  import spark.implicits._

  private def nodeRows(n1: Int, fanout: Int) = {
    // depth-1 groups k0000..k<n1-1>, each with `fanout` children; counts
    // DESCEND with the index so the expected top-k is k0000, k0001, …
    // and include a tie pair inside every parent (c = 1 for the last two
    // children) so the label tiebreak is exercised
    val l1 = (0 until n1).map(i => (1, f"k$i%04d", null: String, (n1 - i).toLong * 10))
    val l2 = for (i <- 0 until n1; j <- 0 until fanout) yield
      (2, f"k$i%04d", f"c$j%02d", if (j >= fanout - 2) 1L else (fanout - j).toLong)
    (l1 ++ l2).toDF("depth", "g1", "g2", "n")
      .withColumn("g3", lit(null).cast("string"))
      .withColumn("g4", lit(null).cast("string"))
      .withColumn("g5", lit(null).cast("string"))
      .withColumn("g6", lit(null).cast("string"))
      .withColumn("g7", lit(null).cast("string"))
      .withColumn("g8", lit(null).cast("string"))
  }

  test("plan-side pre-trim collects only kept nodes; tree identical to full path") {
    val n1 = 500; val fanout = 10; val trim = 3
    val df = nodeRows(n1, fanout)
    // the pruned frame the collect will read: ≤ trim roots + trim² children
    val pruned = ResultTree.pruneForTrim(df, Seq("n"), sortCol = 0,
      ascending = false, trim = trim, byGroup = false)
    val collected = pruned.count()
    val keptBound = trim + trim * trim
    assert(collected <= keptBound,
      s"pre-trim collected $collected rows; bound is $keptBound " +
        s"(full tree is ${n1 + n1 * fanout})")
    // byte-identical JSON vs the unpruned driver-side path
    val fast = ResultTree.toJson(
      ResultTree.fromNodeRows(df, Seq("n"), trim = trim))
    val slowNodes = ResultTree.fromNodeRows(df, Seq("n"), trim = 0)
      // driver-trim the full tree with the same semantics
    def trimTree(ns: Seq[ResultTree.Node]): Seq[ResultTree.Node] =
      ns.take(trim).map(n => n.copy(children = trimTree(n.children)))
    val slow = ResultTree.toJson(trimTree(slowNodes))
    assert(fast == slow, s"pre-trimmed tree diverged:\n fast=$fast\n slow=$slow")
    // spot-check the shape: top roots by count desc, ties by label asc
    assert(fast.contains("\"g\":\"k0000\"") && fast.contains("\"g\":\"k0002\""))
    assert(!fast.contains("\"g\":\"k0003\""))
    // inside each parent the two tied children (c=1) rank by label asc:
    // c08 beats c09 for the last kept slot? trim=3 keeps c00,c01,c02 — no
    // tie at the boundary here; check a tie-boundary trim too
    val fast2 = ResultTree.toJson(
      ResultTree.fromNodeRows(df, Seq("n"), trim = fanout - 1))
    val slow2 = ResultTree.toJson(trimTree2(slowNodes, fanout - 1))
    assert(fast2 == slow2)
  }

  private def trimTree2(ns: Seq[ResultTree.Node], k: Int): Seq[ResultTree.Node] =
    ns.take(k).map(n => n.copy(children = trimTree2(n.children, k)))

  test("byGroup sort pre-trims too; ascending and descending") {
    val df = nodeRows(50, 6)
    for (asc <- Seq(true, false)) {
      val fast = ResultTree.toJson(ResultTree.fromNodeRows(df, Seq("n"),
        ascending = asc, trim = 2, byGroup = true))
      val full = ResultTree.fromNodeRows(df, Seq("n"),
        ascending = asc, trim = 0, byGroup = true)
      def t(ns: Seq[ResultTree.Node]): Seq[ResultTree.Node] =
        ns.take(2).map(n => n.copy(children = t(n.children)))
      assert(fast == ResultTree.toJson(t(full)), s"asc=$asc")
      val pruned = ResultTree.pruneForTrim(df, Seq("n"), 0, asc, 2, byGroup = true)
      assert(pruned.count() <= 2 + 2 * 2)
    }
  }

  test("null sort values rank last on desc, first on asc (−∞ key), like the driver") {
    val df = Seq(
      (1, "a", null: String, java.lang.Long.valueOf(5L)),
      (1, "b", null: String, null: java.lang.Long),
      (1, "c", null: String, java.lang.Long.valueOf(9L)))
      .toDF("depth", "g1", "g2", "n")
      .withColumn("g3", lit(null).cast("string"))
      .withColumn("g4", lit(null).cast("string"))
      .withColumn("g5", lit(null).cast("string"))
      .withColumn("g6", lit(null).cast("string"))
      .withColumn("g7", lit(null).cast("string"))
      .withColumn("g8", lit(null).cast("string"))
    val desc = ResultTree.fromNodeRows(df, Seq("n"), trim = 2)
    assert(desc.map(_.g) == Seq("c", "a"))
    val asc = ResultTree.fromNodeRows(df, Seq("n"), ascending = true, trim = 2)
    assert(asc.map(_.g) == Seq("b", "a"))
  }
}

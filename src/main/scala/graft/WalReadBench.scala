package graft

/** WAL-overlay read amplification: group commit (`flush_rows`) holds up to
  * that many pending rows in the sidelog WAL, and EVERY read overlays them
  * through `Catalog.mergeTouched` — untouched buckets scan committed
  * parquet as-is, touched buckets pay a JSON parse of the pending files
  * plus the upsert merge. This measures query latency vs pending-WAL size
  * so the read-side cost of deferring the drain is a number, not a hope
  * (the write-side win is SCALING.md §Ingest). Prints one line per cell:
  *
  *   `WALREAD pending=<rows> spread=<uniform|one_customer> touched=<k>
  *    cold=<s> warm=<s>`
  *
  * cold = first read after the WAL grew (pays the touched-bucket probe
  * job + overlay plan); warm = min-of-3 repeat reads on the same pending
  * WAL (probe memoized — the steady state between drains). The query is a
  * full-scan `groupBy(event).count()` — every bucket participates, so the
  * overlay cost cannot hide in pruning. Expected shape: warm latency grows
  * with PENDING size only (the committed base is untouched); a pending set
  * clustered on one customer touches ONE bucket and reads like pending=0.
  *
  * `runMain graft.WalReadBench [nBase] [nCustomers]` (default 100k × 5k —
  * sf0.1-sized). Reference: sidelog read-through
  * /root/reference/src/sidelog.h:15-60. */
object WalReadBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val nCust = if (args.length > 1) args(1).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_walread").toString
    val api = new Api(spark, wh)
    val events = Seq("signup", "view", "click", "purchase", "error")
    val t0ms = 1704067200000L
    def mkBatch(b: Int, size: Int, oneCustomer: Boolean): Seq[String] = {
      val base = 1704067200L + b * 1000000L
      (0 until size).map { i =>
        val id = if (oneCustomer) 0 else (b * size + i) % nCust
        s"""{"id":"u$id","stamp":${base + i},"event":"${events(i % 5)}","value":${(i % 997) / 10.0}}"""
      }
    }
    def readSec(table: String): Double = {
      val t0 = System.nanoTime()
      api.catalog.events(table).groupBy("event").count().collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    def cell(table: String, pending: Int, spread: String): Unit = {
      val cold = readSec(table)
      val warm = (1 to 3).map(_ => readSec(table)).min
      val touched = api.catalog.pendingTouchedBuckets(table)
        .map(_.size).getOrElse(0)
      println(f"WALREAD pending=$pending spread=$spread touched=$touched " +
        f"cold=$cold%.3f warm=$warm%.3f")
    }
    for (spread <- Seq("uniform", "one_customer")) {
      val t = s"walread_$spread"
      // flush_rows far above any pending size: nothing drains mid-cell
      api.catalog.create(TableMeta(t, Seq(PropDef("value", "double")),
        TableSettings(flushRows = 10000000)))
      // committed base: batches + explicit flush
      val bs = 20000
      (0 until (nBase + bs - 1) / bs).foreach(b =>
        api.insert(t, mkBatch(b, math.min(bs, nBase - b * bs),
          oneCustomer = false), nowMs = t0ms))
      api.catalog.flush(t, nowMs = t0ms)
      readSec(t): Unit // warm the committed scan (JIT, page cache)
      cell(t, 0, spread)
      var pendingNow = 0
      for (target <- Seq(10000, 50000)) {
        val one = spread == "one_customer"
        (0 until (target - pendingNow) / 5000).foreach(b =>
          api.insert(t, mkBatch(1000 + pendingNow / 5000 + b, 5000, one),
            nowMs = t0ms))
        pendingNow = target
        cell(t, target, spread)
      }
    }
    spark.stop()
  }
}

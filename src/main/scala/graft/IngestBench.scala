package graft

/** Ingest-throughput benchmark over the REAL insert path — JSON parse →
  * stamp normalization → z-order/row-hash upsert → manifest commit —
  * exactly what `POST /v1/insert` does per batch (`Api.insert`,
  * `src/rpc_insert.cpp` is the reference's equivalent). Prints ONE line:
  *
  *   `INGEST events=<n> batches=<k> secs=<s> events_per_sec=<r>`
  *
  * `runMain graft.IngestBench [nEvents] [batchSize] [flushRows]` (default
  * 200 000 × 20 000 — the reference recommends batches of thousands,
  * docs/rest/README.md). `flushRows` > 0 group-commits: batches append to
  * the pending WAL and the bucket merge runs once that many rows are
  * pending (TableSettings.flushRows; a trailing flush is included in the
  * timing). Measured numbers live in SCALING.md §Ingest. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(200000)
    val batchSize = if (args.length > 1) args(1).toInt else 20000
    val flushRows = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    val api = new Api(spark, wh)
    val events = Seq("signup", "view", "click", "purchase", "error")
    def mkBatch(b: Int, size: Int): Seq[String] = {
      val base = 1704067200L + b * 100000L
      (0 until size).map { i =>
        val id = (b * size + i) % 5000
        s"""{"id":"u$id","stamp":${base + i},"event":"${events(i % 5)}","value":${(i % 997) / 10.0}}"""
      }
    }
    def run(table: String, n: Int, size: Int): Double = {
      api.catalog.create(TableMeta(table,
        Seq(PropDef("value", "double")), TableSettings(flushRows = flushRows)))
      val batches = (n + size - 1) / size
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        api.insert(table, mkBatch(b, math.min(size, n - b * size)),
          nowMs = 1704067200000L)
        b += 1
      }
      // group commit defers the bucket merge; charge the stragglers here
      api.catalog.flush(table, nowMs = 1704067200000L)
      (System.nanoTime() - t0) / 1e9
    }
    run("warm", 2 * batchSize, batchSize) // JIT/codegen warm-up
    val secs = run("bench", nEvents, batchSize)
    val rate = math.round(nEvents / secs)
    println(s"INGEST events=$nEvents batches=${(nEvents + batchSize - 1) / batchSize} " +
      s"flush_rows=$flushRows " +
      f"secs=$secs%.2f events_per_sec=$rate")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Measured A/B for the bucketed corpus layout ([[Layout.writeBucketedCorpus]]):
  * the same doc-keyed dedup-family workloads over (a) plain parquet and
  * (b) co-bucketed tables, reporting wall time and TOTAL SHUFFLE WRITE
  * BYTES from the stage metrics. Broadcast joins are disabled for the
  * measurement: at the 100 TB design point neither side of a corpus join
  * fits in a broadcast, so the flat-layout cost IS the sort-merge
  * exchange — which bucketing removes (the number this main exists to
  * print). Run: `sbt "runMain graft.LayoutBench [sfDir]"`; one `LAYOUT`
  * line per (workload, layout).
  *
  * Workloads:
  *  - `enrich_join`: docs ⋈ per-doc quality artifact on doc_id →
  *    per-source rollup (the label/score enrichment every pipeline runs);
  *  - `chunk_stats`: explode token chunks → groupBy(doc_id) (bucketed
  *    reads keep the doc key's partitioning through the Generate, so the
  *    re-aggregation needs no exchange).
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-layout-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // model the at-scale join: a 100 TB corpus never broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val inputR = new java.util.concurrent.atomic.AtomicLong
    val outputR = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inputR.addAndGet(s.stageInfo.taskMetrics.inputMetrics.recordsRead)
        outputR.addAndGet(s.stageInfo.taskMetrics.outputMetrics.recordsWritten)
        ()
      }
    })
    def measure(tag: String)(f: => Long): Unit = {
      Thread.sleep(800) // drain pending stage events from setup work
      shuffleW.set(0)
      inputR.set(0)
      outputR.set(0)
      val t0 = System.nanoTime
      val rows = f
      Thread.sleep(800)
      println(f"LAYOUT $tag rows=$rows time=${(System.nanoTime - t0) / 1e9}%.3f " +
        s"shuffle_write_bytes=${shuffleW.get} input_records=${inputR.get} " +
        s"output_records=${outputR.get}")
    }

    // fresh bucketed tables (orphaned warehouse dirs fail saveAsTable)
    def dropTable(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"spark-warehouse/$t"))
    }
    Seq("lb_docs_b", "lb_scores_b").foreach(dropTable)

    val docs = Tables.documents(spark, sfDir)
    def scoresOf(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      graft.operators.TextOps.tokenCount(col("text")).as("n_tokens"),
      md5(col("text")).as("fp"))

    // layout setup (not measured): bucketed docs + co-bucketed artifact,
    // and a flat parquet copy of the artifact for the baseline
    Layout.writeBucketedCorpus(docs, "lb_docs_b")
    Layout.writeBucketedCorpus(scoresOf(docs), "lb_scores_b")
    val flatScoresDir = java.nio.file.Files
      .createTempDirectory("graft-lb-scores").toString
    scoresOf(docs).write.mode("overwrite").parquet(flatScoresDir)

    val docsB = spark.table("lb_docs_b")
    val scoresB = spark.table("lb_scores_b")
    val scoresFlat = spark.read.parquet(flatScoresDir)

    // combinable aggregates only — the rollup's partial-combined shuffle is
    // a few KB either way, so the A/B delta isolates the JOIN exchanges
    def enrich(d: org.apache.spark.sql.DataFrame,
               s: org.apache.spark.sql.DataFrame): Long =
      d.join(s, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("tokens"), count(lit(1)).as("docs"),
          max(col("fp")).as("max_fp"))
        .count()
    def chunkStats(d: org.apache.spark.sql.DataFrame): Long =
      graft.operators.TextOps.chunk(d, col("text"), 64, 8)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
        .count()

    // round 16: the INGESTED catalog events store vs raw parquet — the
    // person-scoped exchange + sort are what the bucketed manifest read
    // eliminates (the dominant 100 TB cost of every person-scoped query;
    // setup builds the store once, not measured)
    val eventsRaw = Tables.events(spark, sfDir)
      .select("id", "stamp", "event", "value")
    val eventsCat = CatalogStore.events(spark, sfDir)
      .select("id", "stamp", "event", "value")
    def personAgg(e: org.apache.spark.sql.DataFrame): Long =
      e.groupBy(col("id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"),
          min(col("stamp")).as("first"), max(col("stamp")).as("last"))
        .count()
    def funnel(e: org.apache.spark.sql.DataFrame): Long =
      graft.osl.OslEngine.query(e, QueriesOsl.ChainFunnelScript,
        now = Queries.OslNow).count()

    // round 17: the DATE-PARTITIONED store vs the undated bucketed store on
    // a DEEP history — 240 days × 1 500 persons × 3 events/day ingested into
    // both layouts (setup, not measured). A one-week framed tally over the
    // dated store must READ ~7/240 ≈ 3% of the bytes the undated store
    // scans (at 5-year retention the same mechanism reads ~0.4% — the
    // pruning is the 100 TB knob for every .range()/framed query).
    val whDeep = java.nio.file.Files.createTempDirectory("graft_lb_deep").toString
    val catDeep = new Catalog(spark, whDeep)
    val days = 240
    val base = 1672531200000L // 2023-01-01T00:00Z
    locally {
      val props = Seq(PropDef("value", "double"))
      catDeep.create(TableMeta("deep_dated", props,
        TableSettings(idTextual = false, eventMax = 10000000,
          storageBuckets = 4, datePartition = true)))
      catDeep.create(TableMeta("deep_flat", props,
        TableSettings(idTextual = false, eventMax = 10000000,
          storageBuckets = 4)))
      val rows = spark.range(days.toLong * 1500 * 3).selectExpr(
        "id % 1500 AS id",
        s"$base + (id div 4500) * 86400000 + (id % 4500) * 6000 AS stamp",
        "element_at(array('view', 'click', 'purchase'), CAST(id % 3 + 1 AS INT)) AS event",
        "CAST(id % 97 AS DOUBLE) AS value")
      val nowIngest = base + (days + 1).toLong * 86400000L
      catDeep.insert("deep_dated", rows, nowMs = nowIngest)
      catDeep.insert("deep_flat", rows, nowMs = nowIngest)
    }
    val weekLo = base + 120L * 86400000L
    val weekHi = weekLo + 7L * 86400000L - 1
    def framedWeek(e: org.apache.spark.sql.DataFrame): Long =
      e.where(col("stamp").between(weekLo, weekHi))
        .groupBy(col("event"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .count()
    // round 17: DAILY-BATCH ingest write amplification — one fresh day into
    // the 240-day store. The undated layout re-merges every touched
    // bucket's FULL history per insert; the date-scoped merge reads the
    // batch's dates (plus an id-only eventMax guard scan), so its
    // input_records must sit near the guard+day size, not the table size.
    val nextDay = new java.util.concurrent.atomic.AtomicInteger(241)
    def dailyIngest(t: String): Long = {
      val d = nextDay.getAndIncrement().toLong
      val batch = spark.range(1500L * 3).selectExpr(
        "id % 1500 AS id",
        s"${base + d * 86400000L} + (id % 4500) * 6000 AS stamp",
        "element_at(array('view', 'click', 'purchase'), CAST(id % 3 + 1 AS INT)) AS event",
        "CAST(id % 97 AS DOUBLE) AS value")
      catDeep.insert(t, batch, nowMs = base + (d + 1) * 86400000L)
      4500L
    }

    for (round <- 1 to 2) { // round 1 warms code/IO caches; round 2 is clean
      val suffix = if (round == 1) "_warmup" else ""
      measure(s"enrich_join_flat$suffix")(enrich(docs, scoresFlat))
      measure(s"enrich_join_bucketed$suffix")(enrich(docsB, scoresB))
      measure(s"chunk_stats_flat$suffix")(chunkStats(docs))
      measure(s"chunk_stats_bucketed$suffix")(chunkStats(docsB))
      measure(s"person_agg_flat$suffix")(personAgg(eventsRaw))
      measure(s"person_agg_catalog$suffix")(personAgg(eventsCat))
      measure(s"osl_funnel_flat$suffix")(funnel(eventsRaw))
      measure(s"osl_funnel_catalog$suffix")(funnel(eventsCat))
      measure(s"framed_week_undated$suffix")(
        framedWeek(catDeep.events("deep_flat")))
      measure(s"framed_week_dated$suffix")(
        framedWeek(catDeep.eventsFramed("deep_dated", weekLo, weekHi)))
      measure(s"daily_ingest_undated$suffix")(dailyIngest("deep_flat"))
      measure(s"daily_ingest_dated$suffix")(dailyIngest("deep_dated"))
    }
    // round 17: AT-CAP daily ingest — the eventMax-eviction steady state.
    // Pin the cap at the current per-person count (726 = 240 seeded days ×3
    // + two daily legs ×3) so every further day's batch evicts its own size.
    // The undated layout can only full-merge (read + REWRITE the touched
    // buckets' full history); the dated store's SCOPED EVICTION reads the
    // narrow (id, stamp, event) guard columns plus the affected dates and
    // rewrites only the new day + the evicted tail date — output_records is
    // the write-amplification signal (full table vs ~one day). NOTE on
    // input_records: Spark counts block-cache reads as input, so the dated
    // leg's figure includes the guard's localCheckpoint being RE-READ from
    // memory by the decision/merge jobs — the parquet is scanned once
    // (verified by deleting it post-checkpoint), and that one scan is
    // 3 narrow columns, not the full payload the undated full merge reads.
    locally {
      val capAt = 726
      catDeep.updateSettings("deep_flat", _.copy(eventMax = capAt))
      catDeep.updateSettings("deep_dated", _.copy(eventMax = capAt))
      for (round <- 1 to 2) {
        val suffix = if (round == 1) "_warmup" else ""
        measure(s"atcap_ingest_undated$suffix")(dailyIngest("deep_flat"))
        measure(s"atcap_ingest_dated$suffix")(dailyIngest("deep_dated"))
      }
    }
    spark.stop()
  }
}

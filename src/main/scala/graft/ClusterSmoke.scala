package graft

/** Multi-JVM execution validation: run a representative query slice on
  * `local-cluster[2,8,1536]` — Spark's standalone-simulation master, which
  * launches TWO REAL EXECUTOR PROCESSES (separate JVMs, netty shuffle,
  * broadcast over RPC, kryo/java serialization on the wire) — and assert
  * bit-identical results against the same queries on in-process
  * `local[8]`. This exercises everything single-JVM local mode cannot:
  * cross-process task serialization of the compiled plans (OSL window
  * chains, codegen'd kernels, typed Aggregators), executor-side parquet
  * writes in the ingest path, and shuffle/broadcast over sockets. The
  * reference's equivalent surface is its scatter-gather RPC layer
  * (`src/rpc_query.cpp:59-276`).
  *
  * `SPARK_HOME=/opt/spark sbt "runMain graft.ClusterSmoke [sfDir]"` —
  * the executor launcher shells out to `$SPARK_HOME/bin/spark-class`.
  * Prints one PASS/FAIL line per query plus a summary line.
  */
object ClusterSmoke {

  private val queryNames = Seq(
    // hash agg + distinct agg
    "q_event_type_counts",
    // broadcast join + rollup
    "q_mktsegment_orders",
    // OSL Tier A window chain with accumulators (round-9 ordinal path)
    "q_osl_chain_accum",
    // ever-read below a chain step (round-9 late-bound compare)
    "q_osl_chain_ever_read",
    // sessionization windows
    "q_sessions_per_user",
    // minhash LSH (memoized index stage built across executors)
    "q_minhash_lsh_pairs",
    // typed TopK Aggregator (custom partial/merge serialization)
    "q_topk_agg",
    // reverse chain-top fp accumulator (round-11 DESC running frame —
    // fp bit-exactness must survive executor-boundary shuffles)
    "q_osl_reverse_chain_accum",
    // depth-3 framed inner steps (round-11 interval-count reachability
    // incl. rangeBetween endpoint windows)
    "q_osl_chain3_framed",
    // split guards on a depth-4 ordinal chain (round 11: ladder-folded
    // row guard + per-ordinal accumulator guard)
    "q_osl_chain4_guarded",
    // reverse inner step (round 11: FOLLOWING-window tuple collect —
    // the mirrored checks must survive cross-JVM shuffles)
    "q_osl_chain_reverse_inner",
    // restart step (round 11: two-sided inverted-frame collect)
    "q_osl_from_accum",
    // mixed accum-vs-row guard (round 12: ladder least-fold — the exact
    // integer hi arithmetic must be identical across executor JVMs)
    "q_osl_chain_mixed_guard",
    // both depth-3 inner limits (round 12: Γ-array ordinal indexing —
    // collected array ORDER must survive cross-JVM shuffles)
    "q_osl_chain3_both",
    // reverse/restart deepest steps (round 12: other-side interval
    // endpoints over two-sided collect windows)
    "q_osl_chain3_rev_deep",
    "q_osl_chain3_restart",
    // reverse/restart MIDDLE steps (round 12: tuple-side endpoints,
    // floor folded into counts)
    "q_osl_chain3_rev_mid",
    "q_osl_chain3_restart_mid",
    // both steps reverse + rev-mid limit (round 12: modular endpoints)
    "q_osl_chain3_dual_rev",
    // depth-4 reverse deepest (round 12: flipped final ladder window)
    "q_osl_chain4_rev",
    // int(value) mixed guard (round 12: exact truncation on both tiers)
    "q_osl_mixed_value_guard",
    // statement-ordered FoldSum (round 13: the DeclarativeAggregate's
    // buffer must fold identically across executor boundaries)
    "q_osl_multi_accum",
    // round 14: mixed over a framed restart deepest (ordinal least-fold
    // + inverted-frame bracket window), reverse-top mixed (backward
    // ordinal suffix fold via the person total), the contra-direction
    // merged-interval union (collected interval structs must keep exact
    // contents across JVMs), the filtered-hop-max reverse limit, and a
    // non-forward middle at depth 4 (per-level hopWin)
    "q_osl_chain3_restart_framed_mixed",
    "q_osl_mixed_reverse_top",
    "q_osl_mixed_suffix_guard",
    "q_osl_chain3_rev_deep_limited",
    "q_osl_chain4_rev_mid",
    // round 15: the GatedFold (acc, vis) buffer — the sequential gate
    // must fold identically when the person partition lands on a remote
    // executor, single-loop and chain-top both
    "q_osl_where_dynamic",
    "q_osl_where_dynamic_chain",
    // round 15: the depth-6 per-hop middle-limit collect and the
    // contra-union-under-limit rank filter — collected struct CONTENTS
    // must survive cross-JVM shuffles exactly
    "q_osl_chain5_mid_limited",
    // round 15: framed restart limits (the per-hop (G, K) collect at
    // deepest and middle levels) and the JOINT dual-gate fold buffer —
    // both must reproduce exactly on remote-executor partitions
    "q_osl_chain3_restart_framed_limited",
    "q_osl_chain3_restart_framed_mid_limited",
    "q_osl_chain4_restart_framed_mid_limited",
    "q_osl_where_dynamic_dual",
    "q_osl_where_dynamic_carried",
    // round 15: the contra union over a framed-restart-limited deepest
    // (bracket hop window + floored C'-G rank filter in one collect)
    "q_osl_mixed_suffix_restart_limited",
    // round 15: sessionize windows + the session_count person column
    "q_osl_session_tally",
    // round 16: the manifest-backed BUCKETED catalog read — the claimed
    // HashPartitioning(id)/(id, stamp) order must hold when bucket file
    // partitions land on remote executor JVMs (zero-exchange window
    // chain + the pruned single-customer fetch)
    "q_catalog_funnel",
    "q_catalog_customer",
    // round 17: the DATE-PARTITIONED store — event_date pruning + the
    // bucketed claim must hold when the (bucket, date) file partitions
    // land on remote executor JVMs
    "q_catalog_range_tally",
    // round 17: the property-value index — per-bucket distinct partials
    // computed on remote executors must sum to the exact global counts
    "q_propindex_counts",
    // round 17: the dated store's index built through the per-(bucket,
    // date) postings tier, aggregated across executor JVMs
    "q_propindex_dated")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Vector[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).orNull).toVector).toSet
  }

  private def runAll(master: String, sfDir: String,
                     extra: Map[String, String]): Map[String, Set[Vector[String]]] = {
    var b = GraftSession.builder(master, 16)
      .config("spark.driver.host", "127.0.0.1")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try queryNames.map(n => n -> canon(Queries.queries(n)(spark, sfDir))).toMap
    finally spark.stop()
  }

  /** Ingest round-trip on the cluster session: REST-shaped inserts (one
    * below the group-commit threshold, one crossing it) whose parse,
    * bucket merge and staged parquet writes all run ON THE EXECUTORS,
    * then a read-back through the WAL overlay + committed manifest. */
  private def ingestLeg(spark: org.apache.spark.sql.SparkSession): Boolean = {
    val wh = java.nio.file.Files.createTempDirectory("graft_cluster_smoke").toString
    val api = new Api(spark, wh)
    api.catalog.create(TableMeta("smoke",
      Seq(PropDef("value", "double")), TableSettings(flushRows = 4)))
    api.insert("smoke", Seq(
      """{"id":"u1","stamp":1704067200,"event":"signup","value":1.0}""",
      """{"id":"u2","stamp":1704067201,"event":"view","value":2.0}"""),
      nowMs = 1704067200000L)
    val overlaid = api.catalog.events("smoke").count() // pending WAL overlay
    api.insert("smoke", Seq(
      """{"id":"u1","stamp":1704067300,"event":"purchase","value":9.5}""",
      """{"id":"u3","stamp":1704067301,"event":"view","value":3.0}"""),
      nowMs = 1704067200000L) // 4 pending -> grouped drain commits
    val committed = api.catalog.events("smoke").count()
    val gens = api.catalog.eventVersions("smoke").size
    overlaid == 2 && committed == 4 && gens == 1
  }

  /** Round-15 leg: GENERATIONAL membership on the cluster session — the
    * on-disk pointer flip, grace retirement and resolver reads with the
    * refresh writes running on remote executors. */
  private def membershipLeg(spark: org.apache.spark.sql.SparkSession): Boolean = {
    import org.apache.spark.sql.functions.{col, sum}
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_smoke_seg").toString
    val seg: graft.streaming.Streams.SegmentFn = ev =>
      ev.where(col("event") === "purchase").groupBy("id")
        .agg(sum("value").as("v")).where(col("v") > 100).select("id")
    Seq((1L, 1000L, "purchase", 150.0), (2L, 1000L, "purchase", 50.0))
      .toDF("id", "stamp", "event", "value")
      .write.mode("append").parquet(s"$dir/events")
    graft.streaming.Streams.refreshSegments(spark, dir, Map("big" -> seg), 2000L)
    val m1 = graft.streaming.Streams.membership(spark, dir, "big")
      .as[Long].collect().toSet
    Seq((2L, 3000L, "purchase", 80.0)).toDF("id", "stamp", "event", "value")
      .write.mode("append").parquet(s"$dir/events")
    graft.streaming.Streams.refreshSegments(spark, dir, Map("big" -> seg), 4000L)
    val m2 = graft.streaming.Streams.membership(spark, dir, "big")
      .as[Long].collect().toSet
    val enters = graft.streaming.Streams.segmentEvents(spark, dir)
      .where(col("state") === "entered").count()
    // gen 2 is live; gen 1 retained as the reader grace window
    val v1 = new java.io.File(s"$dir/segments/big_v1").isDirectory
    val v2 = new java.io.File(s"$dir/segments/big_v2").isDirectory
    m1 == Set(1L) && m2 == Set(1L, 2L) && enters == 2 && v1 && v2
  }

  /** Round-17 leg: SCOPED eventMax eviction on the cluster session — the
    * guard's narrow column scan, its localCheckpoint (executor block
    * storage), the per-person cutoff join and the date-scoped staged
    * write all run on remote executor JVMs; then the ambiguity fallback
    * (an exact replay of a stored row) runs the full merge there too. */
  private def evictionLeg(spark: org.apache.spark.sql.SparkSession): Boolean = {
    val wh = java.nio.file.Files.createTempDirectory("graft_smoke_evict").toString
    val api = new Api(spark, wh)
    val day = 86400000L
    val d0 = 1704067200000L
    api.catalog.create(TableMeta("ev17", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 2)))
    def ev(id: String, ms: Long) =
      s"""{"id":"$id","stamp":$ms,"event":"e","value":1.0}"""
    api.insert("ev17", (0 until 6).map(d => ev("u1", d0 + d * day)),
      nowMs = d0 + 6 * day)
    api.catalog.updateSettings("ev17", _.copy(eventMax = 6))
    // over-cap fresh row -> scoped eviction must keep exactly the 6 newest
    api.insert("ev17", Seq(ev("u1", d0 + 6 * day)), nowMs = d0 + 6 * day)
    val afterScoped = api.catalog.customerEvents("ev17", "u1")
      .select("stamp").collect().map(_.getLong(0)).toSet
    // exact replay + fresh row -> ambiguity fallback (full merge) still caps
    api.insert("ev17", Seq(ev("u1", d0 + 6 * day), ev("u1", d0 + 7 * day)),
      nowMs = d0 + 7 * day)
    val afterFull = api.catalog.customerEvents("ev17", "u1").count()
    afterScoped == (1 to 6).map(d => d0 + d * day).toSet && afterFull == 6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster executor launch needs SPARK_HOME (e.g. /opt/spark); " +
        "distributions also need SPARK_SCALA_VERSION=2.13 (the launcher " +
        "otherwise probes source-tree build dirs)")
    // two worker JVMs x 8 cores: every shuffle crosses process boundaries
    var ingestOk = false
    var membershipOk = false
    var evictionOk = false
    val clusterSession = GraftSession.builder("local-cluster[2,8,1536]", 16)
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.memory", "1536m")
      .getOrCreate()
    clusterSession.sparkContext.setLogLevel("WARN")
    val cluster =
      try {
        val r = queryNames.map(n =>
          n -> canon(Queries.queries(n)(clusterSession, sfDir))).toMap
        ingestOk = ingestLeg(clusterSession)
        membershipOk = membershipLeg(clusterSession)
        evictionOk = evictionLeg(clusterSession)
        r
      } finally clusterSession.stop()
    val local = runAll("local[8]", sfDir, Map.empty)
    var failed = 0
    queryNames.foreach { n =>
      val ok = cluster(n) == local(n) && cluster(n).nonEmpty
      if (!ok) failed += 1
      println(s"CLUSTERSMOKE $n rows=${cluster(n).size} " +
        (if (ok) "PASS" else s"FAIL (local rows=${local(n).size})"))
    }
    println(s"CLUSTERSMOKE ingest_roundtrip " + (if (ingestOk) "PASS" else "FAIL"))
    if (!ingestOk) failed += 1
    println(s"CLUSTERSMOKE membership_generations " +
      (if (membershipOk) "PASS" else "FAIL"))
    if (!membershipOk) failed += 1
    println(s"CLUSTERSMOKE scoped_eviction " +
      (if (evictionOk) "PASS" else "FAIL"))
    if (!evictionOk) failed += 1
    println(s"CLUSTERSMOKE total=${queryNames.size + 3} failed=$failed " +
      (if (failed == 0) "ALL MATCH across 2 executor JVMs" else "MISMATCH"))
    if (failed > 0) sys.exit(1)
  }
}

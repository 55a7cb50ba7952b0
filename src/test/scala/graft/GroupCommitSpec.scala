package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Group-commit pending WAL (round 9): raw-JSON inserts append to a sidelog
  * WAL and merge into bucket parquet only once `flush_rows` rows are
  * pending, while reads always overlay the pending rows through the same
  * merge transform the drain will write — the reference's sidelog
  * discipline (src/sidelog.h:15-60, insert consumer src/oloop_insert.cpp)
  * re-expressed as deferred Delta-style commits with read-your-writes. */
class GroupCommitSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L

  private def freshApi(flushRows: Int): (Api, String) = {
    val api = new Api(spark, Files.createTempDirectory("graft_gc").toString)
    api.tableCreate(TableMeta("shop",
      Seq(PropDef("product_name", "text"), PropDef("product_price", "double")),
      TableSettings(eventOrder = Seq("purchase"), flushRows = flushRows)))
    (api, "shop")
  }

  private def ev(id: String, sec: Long, event: String, name: String = "rod",
                 price: Double = 10.0): String =
    s"""{"id":"$id","stamp":$sec,"event":"$event","product_name":"$name","product_price":$price}"""

  test("small batches defer the merge but stay read-visible (overlay)") {
    val (api, t) = freshApi(flushRows = 1000)
    val gens0 = api.catalog.eventVersions(t).size
    api.insert(t, Seq(ev("u1", 1704067200L, "view"), ev("u2", 1704067201L, "view")), T0)
    api.insert(t, Seq(ev("u1", 1704067202L, "purchase")), T0)
    // no bucket merge yet: generation count unchanged
    assert(api.catalog.eventVersions(t).size == gens0,
      "merge should be deferred below the flush_rows threshold")
    // …but the live view sees every pending row (read-your-writes)
    assert(api.catalog.events(t).count() == 3)
    assert(api.catalog.events(t).where(col("event") === "purchase").count() == 1)
    // per-customer fetch overlays too
    assert(api.catalog.customerEvents(t, "u1").count() == 2)
    // explicit flush merges: a generation commits, WAL empties, rows identical
    val before = api.catalog.events(t).orderBy("id", "stamp").collect().toSeq
    api.catalog.flush(t, T0)
    assert(api.catalog.eventVersions(t).size > gens0)
    val after = api.catalog.events(t).orderBy("id", "stamp").collect().toSeq
    assert(after == before, "flush must not change the visible rows")
  }

  test("crossing the threshold triggers ONE grouped merge") {
    val (api, t) = freshApi(flushRows = 5)
    (0 until 4).foreach(i =>
      api.insert(t, Seq(ev(s"u$i", 1704067200L + i, "view")), T0))
    val gensBefore = api.catalog.eventVersions(t).size
    api.insert(t, Seq(ev("u9", 1704067209L, "view")), T0) // 5th pending row
    assert(api.catalog.eventVersions(t).size == gensBefore + 1,
      "threshold crossing must commit exactly one grouped generation")
    assert(api.catalog.events(t).count() == 5)
  }

  test("upsert semantics hold across the WAL boundary (replace + dedup)") {
    val (api, t) = freshApi(flushRows = 1000)
    api.insert(t, Seq(ev("u1", 1704067200L, "purchase", "rod", 9.5)), T0)
    api.catalog.flush(t, T0) // committed base row
    // identical row again (pending) → row-hash replace, not a duplicate
    api.insert(t, Seq(ev("u1", 1704067200L, "purchase", "rod", 9.5)), T0)
    assert(api.catalog.events(t).count() == 1)
    // different payload at the same stamp → merges alongside
    api.insert(t, Seq(ev("u1", 1704067200L, "purchase", "reel", 19.5)), T0)
    assert(api.catalog.events(t).count() == 2)
    api.catalog.flush(t, T0)
    assert(api.catalog.events(t).count() == 2)
  }

  test("DataFrame insert drains pending first; DDL flushes pending") {
    val (api, t) = freshApi(flushRows = 1000)
    api.insert(t, Seq(ev("u1", 1704067200L, "view")), T0)
    val df = Seq(("u2", 1704067300000L, "purchase", "net", 5.0))
      .toDF("id", "stamp", "event", "product_name", "product_price")
    api.catalog.insert(t, df, T0)
    // the WAL row was merged ahead of the DataFrame batch
    assert(api.catalog.events(t).count() == 2)
    api.insert(t, Seq(ev("u3", 1704067400L, "view")), T0)
    api.propertyAdd(t, PropDef("coupon", "text"))
    // DDL flushed the pending row under the pre-DDL schema
    assert(api.catalog.events(t).where(col("id") === "u3").count() == 1)
    assert(api.catalog.events(t).columns.contains("coupon"))
  }

  test("WAL replay after a crash is idempotent (dedup by upsert key)") {
    val (api, t) = freshApi(flushRows = 1000)
    api.insert(t, Seq(ev("u1", 1704067200L, "view"), ev("u2", 1704067201L, "view")), T0)
    // find the pending WAL file and copy it aside (simulating a crash
    // between the drain's manifest commit and the WAL retire)
    val pend = new java.io.File(
      new java.io.File(api.warehouse, t), "events_pending")
    val wal = pend.listFiles().filter(_.getName.endsWith(".jsonl")).head
    val saved = Files.readAllBytes(wal.toPath)
    api.catalog.flush(t, T0)
    assert(api.catalog.events(t).count() == 2)
    // replay: the same WAL content reappears under a fresh name (a crashed
    // drain would leave the ORIGINAL un-markered — same parse path) and
    // drains again
    Files.write(new java.io.File(pend,
      s"wal-${System.nanoTime()}-$T0-2.jsonl").toPath, saved)
    api.catalog.flush(t, T0)
    assert(api.catalog.events(t).count() == 2, "replayed rows must dedup")
  }

  test("time travel reads committed generations only — never pending WAL") {
    val (api, t) = freshApi(flushRows = 1000)
    api.insert(t, Seq(ev("u1", 1704067200L, "view")), T0)
    api.catalog.flush(t, T0) // gen 1: one row
    api.insert(t, Seq(ev("u2", 1704067300L, "view")), T0) // pending only
    val gen = api.catalog.eventVersions(t).last
    assert(api.catalog.eventsAt(t, gen).count() == 1,
      "a committed snapshot must not include pending WAL rows")
    assert(api.catalog.events(t).count() == 2, "…but the live view does")
  }

  test("concurrent raw inserts: appends and grouped drains never lose rows") {
    val (api, t) = freshApi(flushRows = 7)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 10).foreach { i =>
            api.insert(t, Seq(
              ev(s"u${w}_$i", 1704067200L + w * 1000 + i, "view")), T0)
          }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    api.catalog.flush(t, T0)
    // 40 distinct rows across 4 writers, mixed appends + threshold drains
    assert(api.catalog.events(t).count() == 40)
    assert(api.catalog.events(t).select("id").distinct().count() == 40)
  }

  test("a drain racing a read between WAL listing and base planning loses nothing") {
    // round-10 ADVICE fix: the committed base must be planned AFTER the
    // WAL listing. The hook fires exactly between the two steps and runs a
    // full drain (commit gen N+1 + .drained markers) — the worst-case
    // interleave. The read must still see every acked row exactly once:
    // WAL files stay readable through the marker grace window and the
    // overlay merge dedups rows that also landed in the new generation.
    val (api, t) = freshApi(flushRows = 1000)
    api.insert(t, Seq(ev("u1", 1704067200L, "view"),
      ev("u2", 1704067201L, "purchase")), T0)
    api.catalog.afterWalListHook = () => api.catalog.flush(t, T0)
    try {
      val df = api.catalog.events(t)
      assert(df.count() == 2, "acked rows must survive a racing drain")
      assert(df.select("id").distinct().count() == 2,
        "double-committed rows must dedup by the upsert key")
      // per-customer fetch takes the same listing-first path
      api.insert(t, Seq(ev("u1", 1704067300L, "view")), T0)
      assert(api.catalog.customerEvents(t, "u1").count() == 2)
    } finally api.catalog.afterWalListHook = () => ()
  }

  test("orphaned .tmp WAL appends are reclaimed past the grace window") {
    val (api, t) = freshApi(flushRows = 1000)
    val pend = new java.io.File(
      new java.io.File(api.warehouse, t), "events_pending")
    pend.mkdirs()
    // a crash between the .tmp write and its publishing rename
    val oldTmp = new java.io.File(pend, s"wal-1-$T0-1.jsonl.tmp")
    Files.write(oldTmp.toPath, "{}".getBytes("UTF-8"))
    assert(oldTmp.setLastModified(
      System.currentTimeMillis() - TableCommit.graceMs - 60000L))
    // …and one that may still be mid-append (young): must survive
    val youngTmp = new java.io.File(pend, s"wal-2-$T0-1.jsonl.tmp")
    Files.write(youngTmp.toPath, "{}".getBytes("UTF-8"))
    api.catalog.flush(t, T0)
    assert(!oldTmp.exists(), "aborted append past grace must be swept")
    assert(youngTmp.exists(), "an in-flight append must not be swept")
    assert(api.catalog.events(t).count() == 0,
      ".tmp content must never be read as table rows")
  }

  test("overlay read amplification is bounded by TOUCHED buckets (round 11)") {
    // the live view's extra cost over a committed read is confined to the
    // buckets the pending rows hash into: untouched buckets scan committed
    // parquet unchanged. Pending rows clustered on ONE customer must touch
    // exactly one bucket regardless of how much committed history exists —
    // the bound that keeps group commit readable at 100 TB (measured shape
    // in SCALING.md §WAL-overlay reads; WalReadBench).
    val (api, t) = freshApi(flushRows = 1000000)
    // committed history across many customers (many buckets)
    api.insert(t, (0 until 64).map(i =>
      ev(s"c$i", 1704067200L + i, "view")), T0)
    api.catalog.flush(t, T0)
    // pending WAL clustered on one customer
    api.insert(t, (0 until 50).map(i =>
      ev("hot", 1704070000L + i, "purchase")), T0)
    val n = api.catalog.events(t).count() // forces the touched probe
    assert(n == 114L)
    val touched = api.catalog.pendingTouchedBuckets(t)
    assert(touched.isDefined, "overlay read must memoize the touched probe")
    assert(touched.get.size == 1,
      s"one-customer pending WAL must touch exactly 1 bucket, got $touched")
    // and a repeat read on the same pending WAL reuses the memo + parsed
    // WAL cache (no behavioral change — same rows)
    assert(api.catalog.events(t).count() == 114L)
  }

  test("flush_rows=0 (default) keeps classic eager behavior") {
    val (api, t) = freshApi(flushRows = 0)
    val gens0 = api.catalog.eventVersions(t).size
    api.insert(t, Seq(ev("u1", 1704067200L, "view")), T0)
    assert(api.catalog.eventVersions(t).size == gens0 + 1,
      "flush_rows=0 must merge every batch immediately")
    assert(api.catalog.events(t).count() == 1)
  }

  // ------------------------------------------------------- round-16 #4:
  // crash-recovery legs for the WAL loop — the reference's sidelog replays
  // from its cursor after a restart (src/sidelog.h:15-60); here a "restart"
  // is a FRESH Api/Catalog over the same warehouse (new caches, new locks),
  // exactly what a replacement driver process sees.

  test("crash recovery: WAL appended, crash before drain — restart replays, nothing lost") {
    val wh = Files.createTempDirectory("graft_crash_a").toString
    val api = new Api(spark, wh)
    api.tableCreate(TableMeta("shop",
      Seq(PropDef("product_name", "text"), PropDef("product_price", "double")),
      TableSettings(eventOrder = Seq("purchase"), flushRows = 1000)))
    api.insert("shop", Seq(
      ev("u1", 1704067200L, "view"), ev("u2", 1704067201L, "view"),
      ev("u1", 1704067202L, "purchase")), T0) // acked: WAL only, no commit
    assert(api.catalog.eventVersions("shop").isEmpty, "nothing committed yet")
    // crash + restart
    val api2 = new Api(spark, wh)
    assert(api2.catalog.events("shop").count() == 3,
      "acked rows must survive the crash via WAL replay visibility")
    assert(api2.catalog.customerEvents("shop", "u1").count() == 2)
    api2.catalog.flush("shop", T0) // the restarted drain resumes the WAL
    assert(api2.catalog.eventVersions("shop").nonEmpty)
    assert(api2.catalog.events("shop").count() == 3)
    api2.catalog.flush("shop", T0) // and replaying again changes nothing
    assert(api2.catalog.events("shop").count() == 3)
  }

  test("crash recovery: committed but WAL unretired — replay is idempotent, no duplicates") {
    val wh = Files.createTempDirectory("graft_crash_b").toString
    val api = new Api(spark, wh)
    api.tableCreate(TableMeta("shop",
      Seq(PropDef("product_name", "text"), PropDef("product_price", "double")),
      TableSettings(eventOrder = Seq("purchase")))) // flush_rows=0: eager drain
    api.insert("shop", Seq(ev("u1", 1704067200L, "view")), T0)
    api.insert("shop", Seq(ev("u2", 1704067201L, "view")), T0)
    // kill point: the drain commits the generation (pointer flipped), then
    // dies BEFORE writing the .drained retirement markers
    object Boom extends RuntimeException("simulated crash after commit")
    api.catalog.afterDrainCommitHook = () => throw Boom
    val thrown = intercept[RuntimeException] {
      api.insert("shop", Seq(ev("u3", 1704067202L, "purchase")), T0)
    }
    assert(thrown eq Boom)
    // window state on disk: u3 is committed AND still listed in the WAL
    // (its .jsonl has no .drained marker; earlier batches' markers persist
    // until the grace-window cleanup and are irrelevant here)
    val pend = new java.io.File(wh, "shop/events_pending")
    def liveWals = {
      val ls = Option(pend.listFiles()).getOrElse(Array.empty)
      val drained = ls.filter(_.getName.endsWith(".drained"))
        .map(_.getName.stripSuffix(".drained")).toSet
      ls.filter(f => f.getName.endsWith(".jsonl") && !drained(f.getName))
    }
    assert(liveWals.nonEmpty, "the crashed drain's WAL must still be live")
    // crash + restart: overlay reads dedup the double-counted rows
    val api2 = new Api(spark, wh)
    assert(api2.catalog.events("shop").count() == 3,
      "replayed WAL rows must collapse into their committed copies")
    assert(api2.catalog.customerEvents("shop", "u3").count() == 1)
    // the restarted drain re-merges the same rows — upsert-idempotent —
    // and finally retires the WAL
    api2.catalog.flush("shop", T0)
    assert(api2.catalog.events("shop").count() == 3)
    assert(liveWals.isEmpty, "replay must retire the WAL")
    // life goes on: the next insert lands exactly once
    api2.insert("shop", Seq(ev("u4", 1704067203L, "view")), T0)
    assert(api2.catalog.events("shop").count() == 4)
  }

  test("crash recovery: enter/exit appended, crash before push drain — exactly-once resume") {
    val wh = Files.createTempDirectory("graft_crash_c").toString
    val api = new Api(spark, wh, clock = () => T0)
    api.tableCreate(TableMeta("shop",
      Seq(PropDef("product_name", "text"), PropDef("product_price", "double")),
      TableSettings(eventOrder = Seq("purchase"))))
    api.insert("shop", Seq(
      ev("u1", 1704067200L, "purchase", price = 150.0),
      ev("u2", 1704067201L, "view")), T0)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val respond500 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (respond500.get()) exchange.sendResponseHeaders(500, -1)
      else { received.add(body): Unit; exchange.sendResponseHeaders(200, -1) }
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      api.subscriptionCreate("shop", "spenders", "hook", nowMs = T0,
        pushUrl = Some(url))
      // the refresh appends the enter event; the push drain then "crashes":
      // we run refreshSegments DIRECTLY (no drain scheduled) — the exact
      // on-disk state of a process that died between append and delivery
      val fns: Map[String, graft.streaming.Streams.SegmentFn] = Map(
        "spenders" -> ((ev: org.apache.spark.sql.DataFrame) =>
          ev.where(col("event") === "purchase" && col("product_price") >= 100.0)
            .select("id").distinct()))
      graft.streaming.Streams.refreshSegments(spark,
        new java.io.File(wh, "shop").toString, fns, nowMs = T0 + 1000L,
        historyOverride = Some(_ => api.catalog.events("shop")))
      assert(received.isEmpty, "nothing delivered before the drain")
      // restart: a fresh Api resumes delivery from the stored cursor.
      // First attempt fails mid-flight (500 = the crash window between
      // POST and ack): the cursor must NOT advance
      val api2 = new Api(spark, wh, clock = () => T0 + 2000L)
      respond500.set(true)
      api2.subscriptionPushDrain("shop", nowMs = T0 + 2000L)
      assert(received.isEmpty)
      // next drain redelivers the SAME batch exactly once
      respond500.set(false)
      api2.subscriptionPushDrain("shop", nowMs = T0 + 2000L)
      assert(received.size == 1, s"expected one delivery, got $received")
      assert(received.peek().contains("\"uid\":\"u1\"") &&
        received.peek().contains("entered"), received.peek())
      // cursor advanced: a further drain delivers nothing
      api2.subscriptionPushDrain("shop", nowMs = T0 + 3000L)
      assert(received.size == 1, s"duplicate delivery after resume: $received")
    } finally server.stop(0)
  }
}

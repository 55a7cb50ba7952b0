package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Catalog DDL + Api façade semantics, mirroring the reference's
  * /v1/table, /v1/insert and /v1/query routes (src/rpc.h:25-94,
  * docs/rest/README.md). */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshApi(): Api =
    new Api(spark, Files.createTempDirectory("graft_wh").toString)

  private def highstreetMeta = TableMeta("highstreet",
    Seq(
      PropDef("product_name", "text"),
      PropDef("product_price", "double"),
      PropDef("product_group", "text", isSet = true),
      PropDef("total_spent", "double", isCustomer = true)),
    TableSettings(eventOrder = Seq("purchase", "purchase_item")))

  test("create / describe / list / drop round-trip") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val m = api.catalog.describe("highstreet")
    assert(m == highstreetMeta)
    assert(api.tableList() == """{"tables":["highstreet"]}""")
    assert(api.tableDescribe("highstreet").contains("\"is_set\":true"))
    // reserved / invalid names rejected
    intercept[IllegalArgumentException] {
      api.catalog.create(TableMeta("Bad-Name", Nil, TableSettings()))
    }
    intercept[IllegalArgumentException] {
      api.catalog.create(TableMeta("t2", Seq(PropDef("stamp", "int")), TableSettings()))
    }
    intercept[IllegalArgumentException] {
      api.catalog.create(TableMeta("t2", Seq(PropDef("x", "uuid")), TableSettings()))
    }
    api.tableDrop("highstreet")
    assert(api.catalog.list().isEmpty)
  }

  test("describe stays fresh when a rewrite aliases the mtime (content-hash cache)") {
    // round-10 ADVICE fix, narrowed in round 11: describe() now prefilters
    // with a (size, mtime) stat — one remote stat instead of a full read
    // per operation on a shared filesystem — and falls back to the content
    // hash when the stat changed. An aliased mtime is still seen here
    // because the rewrite changes the byte LENGTH; in-process writers
    // can never alias at all (writeMeta forces a strictly-increasing
    // mtime, pinned by the next test). An out-of-process writer forging
    // BOTH the old mtime and the old size is outside the contract.
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val m0 = api.catalog.describe("highstreet") // populate the cache
    val f = new java.io.File(
      new java.io.File(api.warehouse, "highstreet"), "table.json")
    val mtime = f.lastModified()
    val json = new String(Files.readAllBytes(f.toPath), "UTF-8")
    val needle = "\"session_time_ms\":" + m0.settings.sessionTimeMs
    assert(json.contains(needle))
    Files.write(f.toPath,
      json.replace(needle, "\"session_time_ms\":12345").getBytes("UTF-8"))
    assert(f.setLastModified(mtime)) // force the exact alias
    assert(api.catalog.describe("highstreet").settings.sessionTimeMs == 12345L,
      "describe must see content changes even under an aliased mtime")
  }

  test("writeMeta forces a strictly-increasing mtime (stat prefilter soundness)") {
    // the describe() stat fast path trusts an unchanged (size, mtime); a
    // same-millisecond same-length rewrite would be stat-invisible, so
    // writeMeta bumps the mtime strictly past the previous version's.
    // Deterministic forcing: push the file's mtime into the FUTURE, then
    // rewrite — the bump must land strictly past the forged time.
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val f = new java.io.File(
      new java.io.File(api.warehouse, "highstreet"), "table.json")
    val future = System.currentTimeMillis() + 60000L
    assert(f.setLastModified(future))
    api.catalog.updateSettings("highstreet", _.copy(sessionTimeMs = 777L))
    assert(f.lastModified() > future,
      "rewrite mtime must be strictly past the previous version's")
    assert(api.catalog.describe("highstreet").settings.sessionTimeMs == 777L)
  }

  test("property add/drop evolve the schema over existing data") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
      nowMs = 1704067200000L)
    api.propertyAdd("highstreet", PropDef("coupon", "text"))
    val ev = api.catalog.events("highstreet")
    assert(ev.columns.contains("coupon"))
    assert(ev.where(col("coupon").isNull).count() == 1) // old rows read as null
    api.propertyDrop("highstreet", "coupon")
    assert(!api.catalog.events("highstreet").columns.contains("coupon"))
  }

  test("insert: stamp normalization, upsert replace, z-order, ttl cull") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    // seconds-resolution stamp is promoted to millis
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}""",
      """{"id":"u1","stamp":"1704067200","event":"purchase_item","product_name":"reel","product_price":5.0}""",
      """{"id":"u1","stamp":"1103067200000","event":"purchase","product_name":"ancient","product_price":1.0}"""),
      nowMs = now)
    val ev1 = api.catalog.events("highstreet").orderBy("stamp").collect()
    // the >5y-old row was TTL-culled; the two same-stamp rows remain
    assert(ev1.length == 2)
    assert(ev1.map(_.getAs[Long]("stamp")).toSet == Set(1704067200000L))
    // same (id, stamp, rank, row-hash) replaces; different payload merges in
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}""",
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"net","product_price":3.0}"""),
      nowMs = now)
    val ev2 = api.catalog.events("highstreet")
    assert(ev2.count() == 3) // rod replaced, net added, reel kept
    // z-order: purchase (rank 0) sorts before purchase_item (rank 1) on ties
    val ordered = graft.operators.EventIngest.ordered(ev2, Seq("purchase", "purchase_item"))
      .select("event").as[String].collect()
    assert(ordered.last == "purchase_item")
  }

  test("query routes: event tree, segment counts, property, customer, histogram") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}""",
      """{"id":"u1","stamp":"1704070800","event":"purchase","product_name":"reel","product_price":5.0}""",
      """{"id":"u2","stamp":"1704067200","event":"browse","product_name":"rod"}"""),
      nowMs = now)

    val tree = api.queryEvent("highstreet",
      """select
        |  count id
        |  sum product_price as spent
        |end
        |each_row where event.is(== 'purchase')
        |  << product_name
        |end
        |""".stripMargin, nowMs = now + 86400000L)
    assert(tree.contains("\"g\":\"rod\"") && tree.contains("\"g\":\"reel\""))

    val segs = api.querySegment("highstreet",
      """@segment buyers
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |@segment browsers
        |if event.ever(== 'browse')
        |  return(true)
        |end
        |""".stripMargin, nowMs = now + 86400000L)
    assert(segs.contains("""{"segment":"buyers","count":1}"""))
    assert(segs.contains("""{"segment":"browsers","count":1}"""))

    val propJson = api.queryProperty("highstreet", "product_name")
    assert(propJson.contains("""{"value":"rod","customers":2}"""))

    val cust = api.queryCustomer("highstreet", "u1")
    assert(cust.contains("\"id\":\"u1\"") && cust.contains("\"product_name\":\"rod\""))

    val hist = api.queryHistogram("highstreet", "spend",
      """spend = sum(product_price) where event.is(== 'purchase')
        |return(spend)
        |""".stripMargin, nowMs = now + 86400000L, bucket = Some(5.0),
      min = Some(0.0), max = Some(15.0))
    // u1 spent 14.5 -> bucket 10; u2 spent 0 -> bucket 0; bucket 5 zero-filled;
    // max branch re-injected with the (empty) >= 15 tail
    assert(hist.contains("""{"g":10,"c":1}""") && hist.contains("""{"g":5,"c":0}"""))
    assert(hist.contains("""{"g":15,"c":0}"""))
    // tail clipping: max=10 totals everything >= 10 into the max branch
    val clipped = api.queryHistogram("highstreet", "spend",
      """spend = sum(product_price) where event.is(== 'purchase')
        |return(spend)
        |""".stripMargin, nowMs = now + 86400000L, bucket = Some(5.0),
      max = Some(10.0))
    assert(clipped.contains("""{"g":10,"c":1}""") && clipped.contains("""{"g":0,"c":1}"""))
    // default fill: bucket set, no min/max -> observed min..max, tail at max
    val defFill = api.queryHistogram("highstreet", "spend",
      """spend = sum(product_price) where event.is(== 'purchase')
        |return(spend)
        |""".stripMargin, nowMs = now + 86400000L, bucket = Some(5.0))
    assert(defFill.contains("""{"g":5,"c":0}""") && defFill.contains("""{"g":10,"c":1}"""))

    assert(api.status().contains("\"tables\":1"))

    val histEach = api.queryHistogram("highstreet", "per_product",
      """n = count(event) where product_name.is(== each_value)
        |return(n)
        |""".stripMargin, nowMs = now + 86400000L,
      foreach = Some("product_name"))
    // every product value gets its own sub-histogram keyed by value
    assert(histEach.contains("\"rod\":[") && histEach.contains("\"reel\":["))
  }

  test("foreach histogram: the value cap is loud and raisable, never silent (round-17 #4)") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    // 8 distinct product values across 4 persons
    val batch = for (u <- 1 to 4; p <- 1 to 8) yield
      s"""{"id":"u$u","stamp":"${1704067200L + u * 100 + p}","event":"purchase","product_name":"p$p","product_price":1.0}"""
    api.insert("highstreet", batch, nowMs = now)
    val script =
      """n = count(event) where product_name.is(== each_value)
        |return(n)
        |""".stripMargin
    // cap below the distinct count: FAIL LOUDLY (the old behavior silently
    // dropped values past the cap — the reference walks the full index,
    // src/oloop_histogram.cpp:232-330)
    val err = intercept[IllegalArgumentException] {
      api.queryHistogram("highstreet", "per_product", script,
        nowMs = now + 86400000L, foreach = Some("product_name"), foreachMax = 5)
    }
    assert(err.getMessage.contains("foreach_max"), err.getMessage)
    // raised cap: all 8 value groups answer, each identical to the
    // sequential single-value run it replaces
    val got = api.queryHistogram("highstreet", "per_product", script,
      nowMs = now + 86400000L, foreach = Some("product_name"), foreachMax = 8)
    (1 to 8).foreach { p =>
      val one = api.queryHistogram("highstreet", "per_product",
        s"each_value = 'p$p'\n" + script, nowMs = now + 86400000L)
      val inner = one.stripPrefix("""{"name":"per_product","histogram":""")
        .stripSuffix("}")
      assert(got.contains(s""""p$p":$inner"""),
        s"foreach group p$p diverged:\n got=$got\n one=$inner")
    }
    // the batch route's foreach_max flag reaches the same guard
    val batchErr = intercept[IllegalArgumentException] {
      api.queryBatch("highstreet",
        "@histogram hp foreach=product_name foreach_max=3\n" + script,
        nowMs = now + 86400000L)
    }
    assert(batchErr.getMessage.contains("foreach_max"), batchErr.getMessage)
  }

  test("dated-store retention: expired date partitions drop at metadata cost (round 17)") {
    val api = freshApi()
    val day = 86400000L
    val d0 = 1704067200000L // 2024-01-01T00:00Z
    api.tableCreate(TableMeta("aged", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 2,
        eventTtlMs = 10 * day)))
    def ev(id: String, ms: Long) =
      s"""{"id":"$id","stamp":$ms,"event":"view","value":1.0}"""
    // 20 days of history for 2 persons
    val batch = for (u <- 0 until 2; d <- 0 until 20) yield
      ev(s"u$u", d0 + d * day + 3600000L)
    // insert with 'now' inside the window: nothing expired yet
    api.insert("aged", batch, nowMs = d0 + 9 * day)
    val root = api.catalog.eventsDir("aged")
    val before = TableCommit.read(root).get
    val filesBefore = before.buckets.values.map(_.size).sum
    assert(api.catalog.events("aged").count() == 40)
    // advance the clock: days 0..9 fully expired at now = d0+20d (horizon
    // d0+10d); the sweep is metadata-only — no Spark job, files retire
    val swept = api.catalog.vacuumExpired("aged", nowMs = d0 + 20 * day)
    assert(swept > 0, "expected expired date partitions to sweep")
    val after = TableCommit.read(root).get
    val filesAfter = after.buckets.values.map(_.size).sum
    assert(filesAfter < filesBefore, s"$filesAfter vs $filesBefore")
    // rows: exactly the stamps >= horizon remain (days 10..19)
    val stamps = api.catalog.events("aged")
      .select("stamp").collect().map(_.getLong(0)).toSet
    val expect = (for (u <- 0 until 2; d <- 10 until 20)
      yield d0 + d * day + 3600000L).toSet
    assert(stamps == expect, s"retention row mismatch: ${stamps.size} rows")
    // swept files RETIRE (grace window) rather than delete: still on disk
    val retiredPaths = after.retired.flatMap(_.paths)
    assert(retiredPaths.nonEmpty)
    assert(retiredPaths.forall(p => new java.io.File(root, p).isFile),
      "retired files must stay readable through the grace window")
    // idempotent: nothing more to sweep at the same clock
    assert(api.catalog.vacuumExpired("aged", nowMs = d0 + 20 * day) == 0)
    // inserts run the sweep inline: new data + an advanced clock ages out
    // another day without any explicit vacuum call
    api.insert("aged", Seq(ev("u0", d0 + 21 * day)), nowMs = d0 + 21 * day)
    val gens = TableCommit.read(root).get
    val dates = gens.buckets.values.flatten
      .map(_.takeWhile(_ != '/').stripPrefix("event_date="))
    assert(!dates.exists(_ == "2024-01-11"), // day 10 expired at now=d0+21d
      s"inline sweep missed an expired day: ${dates.toSeq.sorted}")
  }

  test("dated inserts are date-scoped: other dates' files never rewrite (round 17)") {
    val api = freshApi()
    val day = 86400000L
    val d0 = 1704067200000L
    api.tableCreate(TableMeta("scoped", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 2)))
    def ev(id: String, ms: Long, v: Double) =
      s"""{"id":"$id","stamp":$ms,"event":"ev","value":$v}"""
    // seed: 2 persons × 20 days
    api.insert("scoped", (for (u <- 0 until 2; d <- 0 until 20)
      yield ev(s"u$u", d0 + d * day + u * 1000L, 1.0)), nowMs = d0 + 20 * day)
    val root = api.catalog.eventsDir("scoped")
    val before = TableCommit.read(root).get.buckets
    // a one-day batch (an exact replay INTO day 5 + a fresh row): only that
    // day's entries (plus, at most, the TTL-horizon date) may change
    api.insert("scoped", Seq(
      ev("u0", d0 + 5 * day, 1.0),                 // exact dup: collapses
      ev("u1", d0 + 5 * day + 7777L, 2.0)),        // new row, same day
      nowMs = d0 + 20 * day)
    val after = TableCommit.read(root).get.buckets
    val changedDates = (before.keySet ++ after.keySet).flatMap { b =>
      val a = before.getOrElse(b, Nil).toSet
      val c = after.getOrElse(b, Nil).toSet
      ((a diff c) ++ (c diff a)).map(_.takeWhile(_ != '/'))
    }
    assert(changedDates == Set("event_date=2024-01-06"),
      s"date-scoped insert rewrote extra dates: $changedDates")
    // row semantics exact: the replay collapsed, the fresh row landed
    val rows = api.catalog.events("scoped")
    assert(rows.count() == 41)
    val day5 = rows.where(col("stamp") === (d0 + 5 * day))
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(day5 == Seq(1.0), s"upsert into the scoped day diverged: $day5")
    // eventMax guard: shrinking the cap makes the next insert evict
    // through the SCOPED path (cross-date effect intact — round 17's
    // scoped eviction widens the merge to the surplus rows' dates)
    // (cap change is allowed — only the layout trio is frozen)
    api.catalog.updateSettings("scoped", _.copy(eventMax = 10))
    api.insert("scoped", Seq(ev("u0", d0 + 25 * day, 3.0)), nowMs = d0 + 25 * day)
    val u0 = api.catalog.customerEvents("scoped", "u0").count()
    assert(u0 == 10, s"eventMax eviction through the guard path: $u0")
    // and it kept exactly the 10 NEWEST rows (same retention order as the
    // full merge's cullEventMax)
    val u0min = api.catalog.customerEvents("scoped", "u0")
      .agg(min(col("stamp"))).head().getLong(0)
    assert(u0min == d0 + 11 * day, s"scoped eviction kept the wrong tail: $u0min")
  }

  test("manifest person-count bound: seeded exact, incremented scan-free, cleared by full merges (round 17)") {
    val api = freshApi()
    val day = 86400000L
    val d0 = 1704067200000L
    // one bucket so personMax has a single entry to reason about
    api.tableCreate(TableMeta("bnd", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 1)))
    def ev(id: String, ms: Long, v: Double) =
      s"""{"id":"$id","stamp":$ms,"event":"ev","value":$v}"""
    val root = api.catalog.eventsDir("bnd")
    def bound: Map[Int, Long] = TableCommit.read(root).get.personMax
    // day 0 seeds via the FULL path (empty table): no bound yet
    api.insert("bnd", Seq(ev("u0", d0 + 1000, 1.0), ev("u0", d0 + 2000, 1.0),
      ev("u1", d0 + 500, 1.0)), nowMs = d0)
    assert(bound.isEmpty, s"full seed must not carry a bound: $bound")
    // day 1, scoped, bound missing -> the guard's id-only scan SEEDS the
    // exact per-bucket max person-count (u0: 2 existing + 1 batch = 3)
    api.insert("bnd", Seq(ev("u0", d0 + day + 1000, 1.0)), nowMs = d0 + day)
    assert(bound == Map(0 -> 3L), s"guard scan must seed the exact bound: $bound")
    // day 2 batch replays the day-1 row (upsert collapses it) + one new row:
    // the bound increments by the batch's per-person max (3+2=5) while TRUTH
    // stays 4 — the bound is allowed stale-high, that's what buys O(batch)
    api.insert("bnd", Seq(ev("u0", d0 + day + 1000, 1.0),
      ev("u0", d0 + 2 * day + 1000, 1.0)), nowMs = d0 + 2 * day)
    assert(bound == Map(0 -> 5L), s"increment must ride the stale bound: $bound")
    // day 3: increment path again — 5+1=6. A recompute would have found the
    // collapse and re-seeded 5, so 6 PROVES no history scan ran.
    api.insert("bnd", Seq(ev("u0", d0 + 3 * day + 1000, 1.0)), nowMs = d0 + 3 * day)
    assert(bound == Map(0 -> 6L),
      s"steady-state insert must increment, not rescan (recompute would give 5): $bound")
    // shrink the cap so the bound trips but TRUTH fits: the guard rescans,
    // RE-SEEDS the exact value, and still commits SCOPED (day-0 files intact)
    api.catalog.updateSettings("bnd", _.copy(eventMax = 7))
    val day0Before = TableCommit.read(root).get.buckets(0)
      .filter(_.startsWith("event_date=2024-01-01/")).toSet
    api.insert("bnd", Seq(ev("u0", d0 + 4 * day + 1000, 1.0),
      ev("u0", d0 + 4 * day + 2000, 1.0)), nowMs = d0 + 4 * day)
    assert(bound == Map(0 -> 7L), s"tripped guard must re-seed exact: $bound")
    val day0After = TableCommit.read(root).get.buckets(0)
      .filter(_.startsWith("event_date=2024-01-01/")).toSet
    assert(day0After == day0Before,
      "a re-seeding scoped insert must not rewrite untouched dates")
    // one more row exceeds the cap -> SCOPED eviction (no collision, no
    // tie): u0 keeps the 7 newest, the bound re-seeds at exactly the cap
    api.insert("bnd", Seq(ev("u0", d0 + 5 * day + 1000, 1.0)), nowMs = d0 + 5 * day)
    assert(api.catalog.customerEvents("bnd", "u0").count() == 7,
      "cap overflow must evict through the scoped path")
    assert(api.catalog.customerEvents("bnd", "u0")
      .agg(min(col("stamp"))).head().getLong(0) == d0 + 2000,
      "scoped eviction must drop the single OLDEST row")
    assert(bound == Map(0 -> 7L), s"scoped eviction must re-seed at the cap: $bound")
    // a batch row that COULD upsert-collapse with an over-cap person (same
    // id/stamp/event as a stored row) is ambiguous without payloads ->
    // the full merge decides on complete rows, and CLEARS the bound
    api.insert("bnd", Seq(ev("u0", d0 + 5 * day + 1000, 1.0), // exact replay
      ev("u0", d0 + 6 * day + 1000, 1.0)), nowMs = d0 + 6 * day)
    assert(api.catalog.customerEvents("bnd", "u0").count() == 7,
      "the ambiguous-collapse fallback must still cap at 7 (replay collapsed)")
    assert(bound.isEmpty, s"full-merge fallback must clear its buckets' bounds: $bound")
    // next scoped insert re-seeds from its guard scan (u0 sits AT the cap:
    // 7+0=7 fits; u1 at 2)
    api.insert("bnd", Seq(ev("u1", d0 + 6 * day + 1000, 1.0)), nowMs = d0 + 6 * day)
    assert(bound == Map(0 -> 7L), s"post-merge insert must re-seed: $bound")
    // vacuum that drops a whole bucket drops its bound with it
    api.catalog.updateSettings("bnd", _.copy(eventTtlMs = day))
    assert(api.catalog.vacuumExpired("bnd", nowMs = d0 + 100 * day) > 0)
    assert(bound.isEmpty, s"vacuumed-away buckets must not keep bounds: $bound")
  }

  test("bound trip is per-bucket: untripped buckets increment, never rescan (round 17)") {
    val api = freshApi()
    val day = 86400000L
    val d0 = 1704067200000L
    api.tableCreate(TableMeta("bnd2", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 2)))
    def ev(id: String, ms: Long, v: Double) =
      s"""{"id":"$id","stamp":$ms,"event":"ev","value":$v}"""
    // two ids on different storage buckets (same murmur3 the store uses)
    val ids = (0 until 10).map(i => s"u$i")
    val bucketOf: Map[String, Int] = ids.map { id =>
      id -> ids.toDF("id").where(col("id") === id)
        .select(pmod(hash(col("id")), lit(2))).head().getInt(0)
    }.toMap
    val a = ids.find(bucketOf(_) == 0).get
    val b = ids.find(bucketOf(_) == 1).get
    val root = api.catalog.eventsDir("bnd2")
    def bound: Map[Int, Long] = TableCommit.read(root).get.personMax
    // seed (full), then a scoped insert seeds exact bounds: 3 rows each
    api.insert("bnd2", Seq(ev(a, d0 + 1000, 1.0), ev(a, d0 + 2000, 1.0),
      ev(b, d0 + 1000, 1.0), ev(b, d0 + 2000, 1.0)), nowMs = d0)
    api.insert("bnd2", Seq(ev(a, d0 + day + 1000, 1.0),
      ev(b, d0 + day + 1000, 1.0)), nowMs = d0 + day)
    assert(bound == Map(0 -> 3L, 1 -> 3L), s"exact seed: $bound")
    // b's bucket goes stale-high (replay collapses: truth 4, bound 5)
    api.insert("bnd2", Seq(ev(b, d0 + day + 1000, 1.0),
      ev(b, d0 + 2 * day + 1000, 1.0)), nowMs = d0 + 2 * day)
    assert(bound == Map(0 -> 3L, 1 -> 5L), s"stale-high increment: $bound")
    // a >32-date backfill for `a` full-merges ONLY bucket 0 -> clears its
    // bound; bucket 1 keeps the stale-high 5
    api.insert("bnd2", (10 until 43).map(d =>
      ev(a, d0 + d.toLong * day, 1.0)), nowMs = d0 + 43 * day)
    assert(bound == Map(1 -> 5L), s"full merge clears only its bucket: $bound")
    // mixed batch: bucket 0 tripped (bound missing -> exact 37), bucket 1
    // fine (5+1=6 — a rescan would find truth 5, so 6 PROVES bucket 1's
    // history was not read)
    api.insert("bnd2", Seq(ev(a, d0 + 43 * day + 1000, 1.0),
      ev(b, d0 + 3 * day + 1000, 1.0)), nowMs = d0 + 43 * day)
    assert(bound == Map(0 -> 37L, 1 -> 6L),
      s"per-bucket trip: exact for tripped, increment for ok: $bound")
  }

  test("vacuum is snapshot-isolated: a pre-planned reader completes on its old files") {
    val api = freshApi()
    val day = 86400000L
    val d0 = 1704067200000L
    api.tableCreate(TableMeta("iso", Seq(PropDef("value", "double")),
      TableSettings(datePartition = true, storageBuckets = 2,
        eventTtlMs = 5 * day)))
    api.insert("iso", (0 until 10).map(d =>
      s"""{"id":"u1","stamp":${d0 + d * day},"event":"ev","value":1.0}"""),
      nowMs = d0 + 4 * day) // nothing expired at ingest
    // plan (and snapshot) the full view BEFORE the sweep
    val planned = api.catalog.events("iso")
    planned.queryExecution.executedPlan: Unit // forces file listing
    // sweep at an advanced clock: days 0..4 expire
    val swept = api.catalog.vacuumExpired("iso", nowMs = d0 + 10 * day)
    assert(swept > 0)
    // the pre-planned frame still reads its full snapshot (retired files
    // stay on disk through the grace window)
    assert(planned.count() == 10,
      "pre-vacuum reader lost rows — retire grace violated")
    // a fresh read sees the swept state
    assert(api.catalog.events("iso").count() == 5)
  }

  test("subscriptions: independent cursors over segment enter/exit events") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    val script =
      """@segment buyers refresh=300
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
      nowMs = now)
    api.subscriptionCreate("highstreet", "buyers", "sub1", nowMs = now)
    api.segmentRefresh("highstreet", script, nowMs = now + 1000)

    val poll1 = api.subscriptionPoll("highstreet", "buyers", "sub1", nowMs = now + 2000)
    assert(poll1.contains("\"uid\":\"u1\"") && poll1.contains("\"state\":\"entered\""))
    assert(poll1.contains("\"count\":1"))
    // cursor advanced: nothing new on the second poll
    val poll2 = api.subscriptionPoll("highstreet", "buyers", "sub1", nowMs = now + 3000)
    assert(poll2.contains("\"count\":0"))
    // a second subscriber gets its own independent feed
    api.subscriptionCreate("highstreet", "buyers", "sub2", nowMs = now)
    val poll3 = api.subscriptionPoll("highstreet", "buyers", "sub2", nowMs = now + 3000)
    assert(poll3.contains("\"count\":1"))
    // a new buyer appears -> entered event on the next refresh
    api.insert("highstreet", Seq(
      """{"id":"u2","stamp":"1704067300","event":"purchase","product_name":"net","product_price":3.0}"""),
      nowMs = now)
    api.segmentRefresh("highstreet", script, nowMs = now + 4000)
    val poll4 = api.subscriptionPoll("highstreet", "buyers", "sub1", nowMs = now + 5000)
    assert(poll4.contains("\"uid\":\"u2\"") && poll4.contains("\"state\":\"entered\""))
    api.subscriptionDelete("highstreet", "buyers", "sub1")
    intercept[IllegalArgumentException] {
      api.subscriptionPoll("highstreet", "buyers", "sub1", nowMs = now + 6000)
    }
  }

  test("subscription push delivery: webhook drain, at-least-once retry, retention") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    val script =
      """@segment buyers refresh=300
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin
    // a local webhook endpoint with a switchable failure mode
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failing = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val code = if (failing.get()) 500 else 200
      if (code == 200) received.add(body): Unit
      exchange.sendResponseHeaders(code, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      api.insert("highstreet", Seq(
        """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
        nowMs = now)
      api.subscriptionCreate("highstreet", "buyers", "hooked", nowMs = now,
        pushUrl = Some(url))
      // refresh appends the diff AND enqueues a push drain (async worker)
      api.segmentRefresh("highstreet", script, nowMs = now + 1000)
      api.pushDrainAwait()
      assert(received.size == 1, s"expected one delivery, got ${received.size}")
      val first = received.poll()
      assert(first.contains("\"uid\":\"u1\"") && first.contains("\"state\":\"entered\"")
        && first.contains("\"count\":1"))
      // no new events -> no POST (empty batches are not delivered)
      api.segmentRefresh("highstreet", script, nowMs = now + 2000)
      api.pushDrainAwait()
      assert(received.isEmpty)
      // webhook down: delivery fails, cursor must NOT advance
      failing.set(true)
      api.insert("highstreet", Seq(
        """{"id":"u2","stamp":"1704067300","event":"purchase","product_name":"net","product_price":3.0}"""),
        nowMs = now)
      val failReport = {
        api.segmentRefresh("highstreet", script, nowMs = now + 3000)
        // the worker drained against the failing hook; drain again to inspect
        api.pushDrainAwait()
        failing.set(false)
        api.subscriptionPushDrain("highstreet", nowMs = now + 4000)
      }
      assert(failReport.contains("\"delivered\":1"), failReport)
      val retried = received.poll()
      assert(retried != null && retried.contains("\"uid\":\"u2\""),
        "failed delivery must be retried from the unadvanced cursor")
      // cursor advanced after the successful retry: nothing pending now
      val again = api.subscriptionPushDrain("highstreet", nowMs = now + 5000)
      assert(again.contains("\"delivered\":0"))
      assert(received.isEmpty)
      // retention bounds the replay window: a push sub whose retention has
      // already elapsed sees none of the old events
      api.subscriptionCreate("highstreet", "buyers", "late", nowMs = now + 7200000,
        retentionMs = 1000, pushUrl = Some(url))
      api.subscriptionPushDrain("highstreet", nowMs = now + 7200000)
      assert(received.isEmpty, "events past retention must not be delivered")
    } finally server.stop(0)
  }

  test("a hanging webhook cannot stall ingest batches (async push drain)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val now = 1704067200000L
    // pinned clock so the per-batch drain cutoff stays inside the
    // synthetic-data retention window
    val api = new Api(spark, Files.createTempDirectory("graft_wh").toString,
      clock = () => now + 5000)
    api.tableCreate(highstreetMeta)
    val script =
      """@segment buyers on_insert=true
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin
    val gate = new java.util.concurrent.CountDownLatch(1)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/slow", { exchange =>
      // hang every POST until the test releases the gate — the old
      // synchronous drain would have charged each batch this full wait
      // (long timeout: an early self-release would let a delivery land
      // before the received.isEmpty asynchrony check on a slow host)
      gate.await(300, java.util.concurrent.TimeUnit.SECONDS): Unit
      received.add(new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)): Unit
      exchange.sendResponseHeaders(200, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/slow"
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(String, Long, String, String, Double, Seq[String])]
      val stream = mem.toDF.toDF("id", "stamp", "event", "product_name",
        "product_price", "product_group")
      val ckpt = Files.createTempDirectory("graft_slow_ckpt").toString
      val q = api.startIngest("highstreet", stream, ckpt,
        onInsertScript = Some(script), nowMs = now)
      def batches(ids: Range): Double = {
        val t0 = System.nanoTime()
        ids.foreach { i =>
          mem.addData((s"u$i", now + i * 1000L, "purchase", "rod", 1.0, Seq[String]()))
          q.processAllAvailable()
        }
        (System.nanoTime() - t0) / 1e6
      }
      // BASELINE: three batches with no push subscription — pure commit
      // work at whatever pace this host is running at
      val baselineMs = batches(1 to 3)
      // now register the HANGING hook and run three more batches: the
      // async worker parks on the POST; the batch thread must not
      api.subscriptionCreate("highstreet", "buyers", "slowhook", nowMs = now,
        pushUrl = Some(url))
      val gatedMs = batches(4 to 6)
      q.stop()
      // a synchronous drain would charge EVERY gated batch the 10 s POST
      // timeout (+30 s over baseline); the async worker charges only the
      // batch's own commit work — bound relative to the measured baseline
      // so host load can't fail the test (round 16: the catalog-insert
      // route made per-batch work heavier, which a fixed budget conflated
      // with delivery stalls)
      assert(gatedMs < baselineMs * 2 + 10000,
        f"ingest batches stalled behind the hanging webhook: " +
          f"gated $gatedMs%.0f ms vs baseline $baselineMs%.0f ms")
      assert(api.catalog.events("highstreet").count() == 6)
      // nothing delivered while the hook hangs (asynchrony, directly)
      assert(received.isEmpty, s"delivery ran on the batch path: $received")
      // release the hook: pending messages drain at-least-once (cursor
      // only ever advanced on a 2xx)
      gate.countDown()
      api.pushDrainAwait(60000)
      api.subscriptionPushDrain("highstreet", nowMs = now + 5000): Unit
      val settled = api.subscriptionPushDrain("highstreet", nowMs = now + 5000)
      assert(settled.contains("\"delivered\":0"), settled)
      val all = received.toArray.mkString
      (1 to 6).foreach { i =>
        assert(all.contains(s""""uid":"u$i""""),
          s"u$i never delivered; received=$all")
      }
    } finally { gate.countDown(); server.stop(0) }
  }

  test("segment-events log compaction: files fold to one, feeds unchanged") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    val script =
      """@segment buyers refresh=300
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin
    val logDir = new java.io.File(api.warehouse, "highstreet/segment_events")
    def partFiles() = Option(logDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    def cycle(i: Int): Unit = {
      api.insert("highstreet", Seq(
        s"""{"id":"u$i","stamp":"${1704067200 + i}","event":"purchase","product_name":"rod","product_price":1.0}"""),
        nowMs = now)
      api.segmentRefresh("highstreet", script, nowMs = now + (i + 1) * 1000)
    }
    // a subscriber consumes the first half of the feed, then the log
    // fragments further and compacts — its cursor must hold its position.
    // (cycle(3) comes AFTER the manual compaction: each refresh appends
    // 1-2 part files and segmentRefresh auto-compacts at 8, so a fourth
    // pre-compaction cycle could fold the log on its own — round 16)
    api.subscriptionCreate("highstreet", "buyers", "mid", nowMs = now)
    cycle(0); cycle(1)
    val before = api.subscriptionPoll("highstreet", "buyers", "mid", nowMs = now + 2500)
    assert(before.contains("\"count\":2"), before) // u0, u1 entered so far
    cycle(2)
    assert(partFiles() >= 3, s"expected fragmented log, got ${partFiles()} files")
    val n = graft.streaming.Streams.compactSegmentEvents(spark,
      new java.io.File(api.warehouse, "highstreet").toString, minFiles = 2)
    assert(n >= 3, s"expected >=3 files compacted, got $n")
    assert(partFiles() == 1, s"expected one compacted file, got ${partFiles()}")
    cycle(3) // appends keep working post-compaction
    // the remaining half of the feed arrives exactly once, post-compaction
    val after = api.subscriptionPoll("highstreet", "buyers", "mid", nowMs = now + 10000)
    assert(after.contains("\"count\":2") && after.contains("\"uid\":\"u2\"") &&
      after.contains("\"uid\":\"u3\""), after)
    // fold cycle(3)'s appends, then: below threshold = no-op
    graft.streaming.Streams.compactSegmentEvents(spark,
      new java.io.File(api.warehouse, "highstreet").toString, minFiles = 2): Unit
    assert(graft.streaming.Streams.compactSegmentEvents(spark,
      new java.io.File(api.warehouse, "highstreet").toString, minFiles = 2) == 0L)
  }

  test("property query: search modes, bucket, order, trim, per-segment counts") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"fly rod","product_price":99.0}""",
      """{"id":"u1","stamp":"1704067300","event":"purchase","product_name":"reel","product_price":55.0}""",
      """{"id":"u2","stamp":"1704067200","event":"purchase","product_name":"fly net","product_price":7.0}""",
      """{"id":"u3","stamp":"1704067200","event":"browse","product_name":"fly rod"}"""),
      nowMs = now)
    // sub-string search
    val sub = api.queryProperty("highstreet", "product_name", modes = Seq("sub" -> "fly"))
    assert(sub.contains("\"fly rod\"") && sub.contains("\"fly net\"") && !sub.contains("reel"))
    // numeric gt + bucket
    val gt = api.queryProperty("highstreet", "product_price",
      bucket = Some(50.0), modes = Seq("gt" -> "10"))
    assert(gt.contains("""{"value":50,"customers":1}""") && !gt.contains(""""value":0"""))
    // order asc + trim
    val asc = api.queryProperty("highstreet", "product_name", order = "asc", trim = 1)
    assert(asc.count(_ == '{') == 1)
    // per-segment counts (vs everyone)
    api.segmentRefresh("highstreet",
      """@segment buyers
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin, nowMs = now + 1000)
    val seg = api.queryProperty("highstreet", "product_name",
      modes = Seq("sub" -> "fly rod"), segments = Seq("*", "buyers"))
    assert(seg.contains(""""counts":{"*":2,"buyers":1}"""))
  }

  test("batch route: segments + @use + properties + histograms with foreach") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":99.0}""",
      """{"id":"u1","stamp":"1704067300","event":"purchase","product_name":"reel","product_price":55.0}""",
      """{"id":"u2","stamp":"1704067200","event":"purchase","product_name":"net","product_price":7.0}""",
      """{"id":"u3","stamp":"1704067200","event":"browse","product_name":"rod"}"""),
      nowMs = now)
    val batch =
      """@segment buyers refresh=5_minutes
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |
        |@use buyers
        |
        |@property product_name
        |
        |@histogram spend bucket=50 min=0 max=150
        |spend = sum(product_price) where event.is(== 'purchase')
        |return(spend)
        |
        |@histogram per_product foreach=product_name
        |n = count(event) where product_name.is(== each_value)
        |return(n)
        |""".stripMargin
    val out = api.queryBatch("highstreet", batch, nowMs = now + 1000)
    assert(out.contains("""{"segment":"buyers","count":2}"""))
    // '*' counts everyone (u1+u3 saw rod); 'buyers' only the @use segment
    assert(out.contains(""""value":"rod","counts":{"*":2,"buyers":1}"""))
    // u1 spent 154 -> bucket 150; u2 spent 7 -> bucket 0; 50/100 zero-filled
    assert(out.contains(""""spend":[{"g":0,"c":1},{"g":50,"c":0},{"g":100,"c":0},{"g":150,"c":1}]"""))
    // foreach: per product_name counts (u3 excluded by @use)
    assert(out.contains(""""per_product":{"""))
    // within buyers: u2 has net (n=1), u1 does not (n=0)
    assert(out.contains(""""net":[{"g":0,"c":1},{"g":1,"c":1}]"""))
    assert(api.queryBatch("highstreet", "@property product_name", now).contains("rod"))
  }

  test("streaming ingest into a catalog table feeds segments and subscriptions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    val script =
      """@segment buyers on_insert=true
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |""".stripMargin
    api.subscriptionCreate("highstreet", "buyers", "live", nowMs = 0L)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, String, Double, Seq[String])]
    val stream = mem.toDF.toDF("id", "stamp", "event", "product_name",
      "product_price", "product_group")
    val ckpt = Files.createTempDirectory("graft_api_ckpt").toString
    val q = api.startIngest("highstreet", stream, ckpt,
      onInsertScript = Some(script), nowMs = now)
    mem.addData(("u1", now, "purchase", "rod", 9.5, Seq[String]()))
    q.processAllAvailable()
    mem.addData(("u2", now + 1000, "browse", "rod", 0.0, Seq[String]()))
    q.processAllAvailable()
    q.stop()

    assert(api.catalog.events("highstreet").count() == 2)
    val poll = api.subscriptionPoll("highstreet", "buyers", "live", nowMs = now + 5000)
    assert(poll.contains("\"uid\":\"u1\"") && poll.contains("\"state\":\"entered\""))
    assert(!poll.contains("u2")) // browser never entered
  }

  test("crash-safe swap: orphaned backup and tmp dirs recover on read") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
      nowMs = now)
    val whDir = api.catalog.events("highstreet") // warm
    assert(whDir.count() == 1)
    // simulate a crash between the two renames of a swap: the live dir was
    // moved aside to _bak and the process died before tmp -> dst
    val wh = new java.io.File(api.warehouse, "highstreet")
    val events = new java.io.File(wh, "events")
    val bak = new java.io.File(wh, "events_bak")
    val tmp = new java.io.File(wh, "events_tmp")
    assert(events.renameTo(bak))
    tmp.mkdirs()
    new java.io.File(tmp, "partial.parquet").createNewFile()
    // the next read detects the orphan, restores the backup, clears the tmp
    assert(api.catalog.events("highstreet").count() == 1)
    assert(events.isDirectory && !bak.exists && !tmp.exists)
    // and the next insert still works end-to-end on the recovered dir
    api.insert("highstreet", Seq(
      """{"id":"u2","stamp":"1704067300","event":"purchase","product_name":"net","product_price":3.0}"""),
      nowMs = now)
    assert(api.catalog.events("highstreet").count() == 2)
  }

  test("subscription poll: same-stamp events after the cursor are not lost") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.subscriptionCreate("highstreet", "buyers", "sub", nowMs = now)
    val logDir = new java.io.File(api.warehouse, "highstreet/segment_events").toString
    def append(id: String, stamp: Long): Unit =
      Seq((id, "buyers", "entered", stamp, -1L))
        .toDF("id", "segment", "state", "stamp", "batch_id")
        .write.mode("append").parquet(logDir)
    // a refresh stamps its whole batch with one nowMs; the first poll races
    // it and sees only the first row
    append("ua", now + 1000)
    val p1 = api.subscriptionPoll("highstreet", "buyers", "sub", nowMs = now + 2000)
    assert(p1.contains("\"count\":1") && p1.contains("\"uid\":\"ua\""))
    // the rest of the same-stamp batch lands after the poll
    append("ub", now + 1000)
    val p2 = api.subscriptionPoll("highstreet", "buyers", "sub", nowMs = now + 3000)
    assert(p2.contains("\"count\":1") && p2.contains("\"uid\":\"ub\""),
      s"same-stamp event skipped: $p2")
  }

  test("JSON escaping: control characters in values stay valid JSON") {
    assert(Json.str("a\nb\tc\"d\\e") == "\"a\\u000ab\\u0009c\\\"d\\\\e\"")
    intercept[IllegalArgumentException] { Json.oslStr("bad\nvalue") }
    assert(Json.oslStr("it's a \\ test") == "'it\\'s a \\\\ test'")
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"two\nlines","product_price":1.0}"""),
      nowMs = now)
    val out = api.queryProperty("highstreet", "product_name")
    assert(!out.contains("\n") && out.contains("two\\u000alines"))
  }

  test("bucketed storage: inserts rewrite only touched id-hash buckets") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}""",
      """{"id":"u2","stamp":"1704067200","event":"browse","product_name":"rod"}"""),
      nowMs = now)
    val root = new java.io.File(api.warehouse, "highstreet/events")
    def bucketDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("__bucket=")).sortBy(_.getName)
    val before = bucketDirs.map(d => d.getName -> d.lastModified()).toMap
    assert(before.nonEmpty, "expected __bucket= partition dirs")
    Thread.sleep(1100) // dir mtime granularity
    // a u1-only insert must not touch u2's bucket dir
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704070800","event":"purchase","product_name":"reel","product_price":5.0}"""),
      nowMs = now)
    val m = api.catalog.describe("highstreet")
    import org.apache.spark.sql.functions.{hash, pmod, lit => flit}
    // new tables bucket by murmur3 (Spark's own bucket-table hash)
    assert(m.settings.bucketHash == "murmur3")
    val b1 = Seq("u1").toDF("id")
      .select(pmod(hash(col("id")), flit(m.settings.storageBuckets)))
      .head().getInt(0)
    val after = bucketDirs.map(d => d.getName -> d.lastModified()).toMap
    after.foreach { case (name, mtime) =>
      if (name == s"__bucket=$b1") assert(mtime > before(name), s"$name not rewritten")
      else assert(mtime == before(name), s"untouched $name was rewritten")
    }
    assert(api.catalog.events("highstreet").count() == 3)
    // customer fetch prunes to the id's bucket partition
    val plan = api.catalog.customerEvents("highstreet", "u1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"expected partition pruning in:\n$plan")
    assert(api.queryCustomer("highstreet", "u1").contains("\"product_name\":\"reel\""))
  }

  test("time travel: eventsAt reads past generations until vacuumed") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
      nowMs = now)
    api.insert("highstreet", Seq(
      """{"id":"u2","stamp":"1704070800","event":"browse","product_name":"reel"}"""),
      nowMs = now)
    val versions = api.catalog.eventVersions("highstreet")
    assert(versions.size >= 2, s"expected >=2 readable generations, got $versions")
    val (v1, v2) = (versions(versions.size - 2), versions.last)
    // the older snapshot sees only the first batch; the live one sees both
    assert(api.catalog.eventsAt("highstreet", v1).count() == 1)
    assert(api.catalog.eventsAt("highstreet", v2).count() == 2)
    assert(api.catalog.events("highstreet").count() == 2)
    // never-committed generation is a clear error
    val e = intercept[IllegalArgumentException] {
      api.catalog.eventsAt("highstreet", 9999L).count()
    }
    assert(e.getMessage.contains("not available"))
    // vacuum: with a zero grace window, the next commit GCs retired files
    // and the superseded snapshot becomes unreadable
    val oldGrace = TableCommit.graceMs
    try {
      TableCommit.graceMs = 0L
      api.insert("highstreet", Seq(
        """{"id":"u1","stamp":"1704074400","event":"browse","product_name":"line"}"""),
        nowMs = now + 1)
      val left = api.catalog.eventVersions("highstreet")
      assert(!left.contains(v1), s"v1 should be vacuumed, have $left")
      assert(api.catalog.eventsAt("highstreet", left.last).count() == 3)
    } finally TableCommit.graceMs = oldGrace
  }

  test("commit protocol is rename-free: create-new log, torn-write skip, conflict detect") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"rod","product_price":9.5}"""),
      nowMs = now)
    api.insert("highstreet", Seq(
      """{"id":"u2","stamp":"1704070800","event":"browse","product_name":"reel"}"""),
      nowMs = now)
    val root = new java.io.File(api.warehouse, "highstreet/events").toString
    // (a) LIVE state comes from the versioned log alone — no renamed
    // `_commit` pointer exists (nothing on the commit path renames at all,
    // so the protocol holds on stores where rename is copy+delete)
    assert(!new java.io.File(root, "_commit").exists(),
      "live pointer must be the _commit.v{gen} log, not a renamed file")
    val live = TableCommit.read(root).get
    assert(live.gen == TableCommit.versions(root).max)
    assert(api.catalog.events("highstreet").count() == 2)
    // (b) a torn manifest at a HIGHER generation (committer crashed
    // mid-write; strict-JSON prefix never parses) is invisible to readers
    val torn = new java.io.File(root, s"_commit.v${live.gen + 1}")
    java.nio.file.Files.writeString(torn.toPath,
      s"""{"gen":${live.gen + 1},"buckets":{"0":["part-x.parquet"""")
    assert(TableCommit.read(root).get.gen == live.gen,
      "torn higher-gen manifest must be skipped")
    assert(api.catalog.events("highstreet").count() == 2)
    // (c) the next committer reclaims the torn file and commits that gen
    api.insert("highstreet", Seq(
      """{"id":"u3","stamp":"1704074400","event":"browse","product_name":"net"}"""),
      nowMs = now)
    val after = TableCommit.read(root).get
    assert(after.gen == live.gen + 1 && after.buckets.nonEmpty)
    assert(api.catalog.events("highstreet").count() == 3)
    // (d) two writers racing to one generation: the loser gets a clear
    // conflict instead of clobbering the winner's committed state
    intercept[java.nio.file.FileAlreadyExistsException] {
      TableCommit.write(root, after.copy(retired = Nil))
    }
    assert(TableCommit.read(root).get == after, "loser must not disturb the log")
    // (e) in-place damage that still re-closes as VALID JSON (no "eof":1
    // end marker survives) reads as uncommitted — the eof field is checked,
    // not just written — and read() falls back one generation
    val vf = new java.io.File(root, s"_commit.v${after.gen}")
    java.nio.file.Files.writeString(vf.toPath,
      s"""{"gen":${after.gen},"buckets":{}}""")
    val fallback = TableCommit.read(root).get
    assert(fallback.gen == after.gen - 1,
      s"damaged manifest (missing eof) must be skipped, got gen ${fallback.gen}")
  }

  test("customerEvents hashes the lookup id at the stored id type") {
    val api = freshApi()
    // numeric table: id stored as LongType — an uncast Int/String literal
    // would xxhash64 to a different bucket and silently return no history
    api.tableCreate(TableMeta("numtab",
      Seq(PropDef("product_price", "double")),
      TableSettings(idTextual = false)))
    val now = 1704067200000L
    api.insert("numtab", Seq(
      """{"id":7,"stamp":"1704067200","event":"purchase","product_price":9.5}""",
      """{"id":8,"stamp":"1704067200","event":"browse"}"""),
      nowMs = now)
    // Int, Long and numeric-string callers all prune to id 7's bucket
    assert(api.catalog.customerEvents("numtab", 7).count() == 1)
    assert(api.catalog.customerEvents("numtab", 7L).count() == 1)
    assert(api.catalog.customerEvents("numtab", "7").count() == 1)
    assert(api.catalog.customerEvents("numtab", 9L).count() == 0)
  }

  test("legacy flat events dir: first insert migrates the whole table") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    // simulate a pre-bucket layout: flat parquet files at the events root
    val root = new java.io.File(api.warehouse, "highstreet/events")
    val m = api.catalog.describe("highstreet")
    val legacy = Seq(
      ("u1", 1704060000000L, "purchase", "rod", 9.5, Seq[String]()),
      ("u2", 1704060000000L, "browse", "rod", 0.0, Seq[String]()))
      .toDF("id", "stamp", "event", "product_name", "product_price", "product_group")
    spark.createDataFrame(legacy.rdd, m.eventsSchema)
      .write.mode("overwrite").parquet(root.toString)
    assert(root.listFiles().exists(_.getName.endsWith(".parquet")))
    // the flat layout reads fine before any insert
    assert(api.catalog.events("highstreet").count() == 2)
    // first insert migrates: merged whole, bucketed layout, no flat leftovers
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"reel","product_price":5.0}"""),
      nowMs = now)
    val files = root.listFiles().filterNot(f =>
      f.getName.startsWith(".") || f.getName == "_SUCCESS" ||
        // migration also seeds the commit manifest (+ time-travel copies)
        f.getName.startsWith("_commit"))
    assert(files.nonEmpty && files.forall(f =>
      f.isDirectory && f.getName.startsWith("__bucket=")),
      s"expected pure bucketed layout, got ${files.map(_.getName).mkString(",")}")
    assert(TableCommit.read(root.toString).exists(_.buckets.nonEmpty),
      "migration must seed the snapshot manifest")
    val ev = api.catalog.events("highstreet")
    assert(ev.count() == 3, "legacy rows lost or duplicated in migration")
    assert(ev.where(col("id") === "u2").count() == 1)
    // and the NEXT insert is per-touched-bucket again over the migrated dir
    api.insert("highstreet", Seq(
      """{"id":"u3","stamp":"1704067300","event":"browse","product_name":"net"}"""),
      nowMs = now)
    assert(api.catalog.events("highstreet").count() == 4)
  }

  test("histogram fill: fractional buckets stay on the data grid; bucket>0 enforced") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    val now = 1704067200000L
    // values 0.1 and 0.5 with bucket 0.1: naive mn + i*b accumulation puts a
    // zero-filled 0.30000000000000004 next to the real 0.3 grid key
    api.insert("highstreet", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_name":"a","product_price":0.1}""",
      """{"id":"u2","stamp":"1704067200","event":"purchase","product_name":"b","product_price":0.5}"""),
      nowMs = now)
    val hist = api.queryHistogram("highstreet", "spend",
      """spend = sum(product_price) where event.is(== 'purchase')
        |return(spend)
        |""".stripMargin, nowMs = now + 86400000L, bucket = Some(0.1))
    val gs = """"g":([-0-9.E]+)""".r.findAllMatchIn(hist).map(_.group(1)).toSeq
    assert(gs.distinct.size == gs.size, s"duplicate grid keys in $hist")
    // grid: 0.1, 0.2, 3*0.1 (= 0.30000000000000004, matching the data
    // grid exactly — no off-grid twin), 0.4, 0.5 (observed-max tail)
    assert(gs.size == 5, s"expected 5 grid keys, got $gs in $hist")
    assert(gs.contains("0.30000000000000004"), s"fill left the data grid: $gs")
    // zero/negative bucket widths are rejected, not an infinite fill loop
    intercept[IllegalArgumentException] {
      api.queryHistogram("highstreet", "spend", "return(1)\n", nowMs = now,
        bucket = Some(0.0))
    }
    intercept[IllegalArgumentException] {
      api.queryProperty("highstreet", "product_price", bucket = Some(-1.0))
    }
  }

  test("customer-property facts merge by id") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    api.catalog.mergeCustomers("highstreet",
      Seq(("u1", 14.5)).toDF("id", "total_spent"))
    api.catalog.mergeCustomers("highstreet",
      Seq(("u1", 20.0), ("u2", 1.0)).toDF("id", "total_spent"))
    val c = api.catalog.customers("highstreet").orderBy("id")
      .as[(String, Double)].collect().toSeq
    assert(c == Seq(("u1", 20.0), ("u2", 1.0))) // update wins, new id appends
  }

  test("OSL script customer-prop write-back (setGridProps semantics)") {
    // mirrors docs/osl/language_reference.md "customer properties": a script
    // assigns a declared is_customer prop; the interpreter detects the
    // change and merges it back into the customer record.
    val api = freshApi()
    val meta = TableMeta("shop", Seq(
      PropDef("product_price", "double"),
      PropDef("total_spent", "double", isCustomer = true),
      PropDef("tier", "text", isCustomer = true)), TableSettings())
    api.tableCreate(meta)
    val now = 1704067200000L
    api.insert("shop", Seq(
      """{"id":"u1","stamp":"1704067200","event":"purchase","product_price":9.5}""",
      """{"id":"u1","stamp":"1704067300","event":"purchase","product_price":20.5}""",
      """{"id":"u2","stamp":"1704067200","event":"purchase","product_price":5.0}""",
      """{"id":"u3","stamp":"1704067200","event":"browse"}"""),
      nowMs = now)
    // pre-existing customer record: u2 has a tier the script never touches
    // and a stale total the script overwrites
    api.catalog.mergeCustomers("shop",
      Seq(("u2", 999.0, "gold")).toDF("id", "total_spent", "tier"))

    api.catalog.runPropWriteback("shop",
      "total_spent = sum(product_price) where event.is(== 'purchase')",
      nowMs = now + 1000)

    val c = api.catalog.customers("shop")
      .select("id", "total_spent", "tier").orderBy("id")
      .as[(String, Double, Option[String])].collect().toSeq
    assert(c == Seq(
      ("u1", 30.0, None),          // new customer row created by the script
      ("u2", 5.0, Some("gold")),   // overwritten total; untouched tier survives
      ("u3", 0.0, None)))          // no purchases -> sum() = 0, still written
    // reading a seeded prop: scripts see the stored value before assignment
    api.catalog.runPropWriteback("shop",
      "total_spent = total_spent + 1", nowMs = now + 2000)
    val c2 = api.catalog.customers("shop")
      .select("id", "total_spent").orderBy("id")
      .as[(String, Double)].collect().toSeq
    assert(c2 == Seq(("u1", 31.0), ("u2", 6.0), ("u3", 1.0)))
  }

  test("bucket files are written (id, stamp)-clustered for row-group pruning") {
    val api = freshApi()
    api.tableCreate(highstreetMeta)
    api.insert("highstreet", Seq(
      """{"id":"u9","stamp":5000,"event":"b"}""",
      """{"id":"u1","stamp":3000,"event":"a"}""",
      """{"id":"u1","stamp":1000,"event":"a"}""",
      """{"id":"u9","stamp":2000,"event":"a"}"""), nowMs = 10000L)
    val root = new java.io.File(api.catalog.eventsDir("highstreet"))
    val parts = root.listFiles().filter(_.getName.startsWith("__bucket="))
    assert(parts.nonEmpty)
    parts.foreach { p =>
      p.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        // within one file, rows must be (id, stamp)-ordered as written
        val rows = spark.read.parquet(f.toString)
          .select("id", "stamp").as[(String, Long)].collect().toSeq
        assert(rows == rows.sortBy(identity), s"unclustered file: $f")
      }
    }
  }
}

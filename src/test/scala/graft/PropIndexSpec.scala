package graft

import org.apache.spark.sql.functions._

/** The materialized property-value index (round-17 #2): answer parity with
  * the row scan across the full queryProperty parameter surface,
  * incremental per-touched-bucket refresh, DDL invalidation, and the
  * fallback routes. */
class PropIndexSpec extends SparkSpec {

  private def freshApi(): Api = new Api(spark,
    java.nio.file.Files.createTempDirectory("graft_pidx").toString)

  private def mkTable(api: Api, buckets: Int = 4): Unit = {
    api.tableCreate(TableMeta("shop",
      Seq(PropDef("value", "double"), PropDef("plan", "text"),
        PropDef("tags", "text", isSet = true)),
      TableSettings(storageBuckets = buckets)))
  }

  private val now = 1704067200000L
  private def ev(id: String, t: Long, e: String, v: Double, plan: String) =
    s"""{"id":"$id","stamp":${now + t},"event":"$e","value":$v,"plan":"$plan"}"""

  /** The scan-path answer computed independently in the spec (the pre-index
    * semantics), for any (prop, modes, order, trim). */
  private def scanAnswer(api: Api, prop: String,
                         modes: Seq[(String, String)],
                         order: String, trim: Int): Seq[(Option[Any], Long)] = {
    val ev = api.catalog.events("shop")
    val c = col(prop)
    val num = c.cast("string").try_cast("double")
    val filtered = modes.foldLeft(ev) { case (df, (op, v)) =>
      op match {
        case "gt"  => df.where(num > v.toDouble)
        case "gte" => df.where(num >= v.toDouble)
        case "lt"  => df.where(num < v.toDouble)
        case "lte" => df.where(num <= v.toDouble)
        case "eq"  => df.where(num === v.toDouble)
        case "between" =>
          val Array(lo, hi) = v.split(",", 2).map(_.trim.toDouble)
          df.where(num >= lo && num < hi)
        case "rx"  => df.where(c.cast("string").rlike(v))
        case "sub" => df.where(c.cast("string").contains(v))
      }
    }
    val counted = filtered.groupBy(c.as("__v"))
      .agg(countDistinct(col("id")).as("__c0"))
      .orderBy(if (order == "asc") col("__c0").asc else col("__c0").desc,
        col("__v").asc)
    val limited = if (trim > 0) counted.limit(trim) else counted
    limited.collect().toSeq.map(r => (Option(r.get(0)), r.getLong(1)))
  }

  private def viaApi(api: Api, prop: String, modes: Seq[(String, String)],
                     order: String, trim: Int): String =
    api.queryProperty("shop", prop, modes = modes, order = order, trim = trim)

  private def render(rows: Seq[(Option[Any], Long)]): String =
    rows.map { case (v, n) =>
      val vs = v.map {
        case s: String => Json.str(s)
        case d: Double => if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
        case o => o.toString
      }.getOrElse("null")
      s"""{"value":$vs,"customers":$n}"""
    }.mkString("[", ",", "]")

  test("index-only answers match the row scan across modes/order/trim") {
    val api = freshApi()
    mkTable(api)
    val batch = (0 until 20).flatMap(u => Seq(
      ev(s"u$u", u * 1000L, "view", u * 1.5, if (u % 3 == 0) "pro" else "free"),
      ev(s"u$u", u * 1000L + 1, "purchase", u * 10.0, "free"))) :+
      // a null-valued prop row: the null group must count in both paths
      s"""{"id":"u0","stamp":${now + 99000},"event":"ping","value":1.0}"""
    api.insert("shop", batch, nowMs = now)
    val cases = Seq(
      ("event", Nil, "desc", 0),
      ("event", Nil, "asc", 0),
      ("event", Nil, "desc", 2),
      ("plan", Nil, "desc", 0),
      ("plan", Seq("sub" -> "ro"), "desc", 0),
      ("plan", Seq("rx" -> "^f"), "asc", 0),
      ("value", Seq("gte" -> "30", "lt" -> "120"), "desc", 0),
      ("value", Seq("between" -> "10,100"), "asc", 3),
      ("value", Seq("eq" -> "15"), "desc", 0))
    cases.foreach { case (prop, modes, order, trim) =>
      val got = viaApi(api, prop, modes.toSeq, order, trim)
      val want = render(scanAnswer(api, prop, modes.toSeq, order, trim))
      assert(got == want, s"($prop, $modes, $order, $trim):\n got=$got\n exp=$want")
    }
  }

  test("dated tables: refresh is per-DATE through postings — a daily insert re-reads one day (round 17)") {
    val api = freshApi()
    api.tableCreate(TableMeta("shopd",
      Seq(PropDef("value", "double"), PropDef("plan", "text")),
      TableSettings(storageBuckets = 2, datePartition = true)))
    val day = 86400000L
    def evd(id: String, d: Int, e: String, plan: String) =
      s"""{"id":"$id","stamp":${now + d * day},"event":"$e",""" +
        s""""value":1.0,"plan":"$plan"}"""
    // 10 days × 4 persons, alternating values
    api.insert("shopd", (for (u <- 0 until 4; d <- 0 until 10)
      yield evd(s"u$u", d, if (d % 2 == 0) "view" else "click",
        if (u % 2 == 0) "pro" else "free")), nowMs = now + 10 * day)
    val got1 = api.queryProperty("shopd", "event")
    assert(got1.contains(""""value":"view","customers":4"""), got1)
    assert(got1.contains(""""value":"click","customers":4"""), got1)
    val plans = api.queryProperty("shopd", "plan")
    assert(plans.contains(""""value":"pro","customers":2"""), plans)
    val pDir = new java.io.File(api.warehouse, "shopd/propindex/postings")
    val p1 = TableCommit.read(pDir.toString).get.buckets
    assert(p1.values.flatten.exists(_.startsWith("event_date=")),
      s"postings must be (bucket, date)-partitioned: $p1")
    // a one-day insert: the refresh must rewrite ONLY that (bucket, date)
    // postings cell — every other date's postings files stay byte-identical
    api.insert("shopd", Seq(evd("u9", 10, "purchase", "pro")),
      nowMs = now + 11 * day)
    val got2 = api.queryProperty("shopd", "event")
    assert(got2.contains(""""value":"purchase","customers":1"""), got2)
    assert(got2.contains(""""value":"view","customers":4"""), got2)
    val p2 = TableCommit.read(pDir.toString).get.buckets
    val changedCells = (p1.keySet ++ p2.keySet).flatMap { b =>
      val a = p1.getOrElse(b, Nil).toSet
      val c = p2.getOrElse(b, Nil).toSet
      ((a diff c) ++ (c diff a)).map(f => s"$b/${f.takeWhile(_ != '/')}")
    }
    assert(changedCells.size == 1 &&
      changedCells.head.endsWith("/event_date=2024-01-11"),
      s"a one-day insert must refresh exactly its one postings cell: $changedCells")
    // and a full-surface parity probe on the dated index
    val sub = api.queryProperty("shopd", "event", modes = Seq("sub" -> "ick"))
    assert(sub.contains(""""value":"click","customers":4""") &&
      !sub.contains("view"), sub)
  }

  test("refresh is incremental: an insert re-indexes only its touched buckets") {
    val api = freshApi()
    mkTable(api, buckets = 8)
    api.insert("shop", (0 until 32).map(u =>
      ev(s"u$u", u * 1000L, "view", 1.0, "free")), nowMs = now)
    api.queryProperty("shop", "event"): Unit // builds the index
    val dataDir = new java.io.File(api.warehouse, "shop/propindex/data")
    val before = TableCommit.read(dataDir.toString).get.buckets
    assert(before.nonEmpty)
    // one new person -> exactly one touched storage bucket
    api.insert("shop", Seq(ev("u_new", 500L, "purchase", 2.0, "pro")), nowMs = now)
    api.queryProperty("shop", "event"): Unit // incremental refresh
    val after = TableCommit.read(dataDir.toString).get.buckets
    val changed = (before.keySet ++ after.keySet).filter(b =>
      before.get(b) != after.get(b))
    assert(changed.size == 1,
      s"expected exactly 1 re-indexed bucket, got $changed")
    // and the counts stay exact
    val got = api.queryProperty("shop", "event")
    assert(got.contains(""""value":"purchase","customers":1"""), got)
    assert(got.contains(""""value":"view","customers":32"""), got)
  }

  test("DDL invalidates: a property added after indexing is served correctly") {
    val api = freshApi()
    mkTable(api)
    api.insert("shop", Seq(ev("u1", 0L, "view", 1.0, "free")), nowMs = now)
    api.queryProperty("shop", "event"): Unit // index built pre-DDL
    api.propertyAdd("shop", PropDef("tier", "int"))
    api.insert("shop",
      Seq(s"""{"id":"u2","stamp":${now + 1000},"event":"view","value":2.0,"tier":5}"""),
      nowMs = now)
    val got = api.queryProperty("shop", "tier")
    // u2 has tier=5; u1 predates the column -> null group of 1
    assert(got.contains(""""value":5,"customers":1"""), got)
    assert(got.contains(""""value":null,"customers":1"""), got)
  }

  test("index-countable segments: .ever(== lit) populations answer from the index") {
    val api = freshApi()
    mkTable(api)
    val batch = (0 until 12).flatMap(u => Seq(
      ev(s"u$u", u * 1000L, "view", u.toDouble, "free")) ++
      (if (u % 3 == 0) Seq(ev(s"u$u", u * 1000L + 1, "purchase", 5.0, "pro")) else Nil))
    api.insert("shop", batch, nowMs = now)
    val script =
      """@segment buyers
        |if event.ever(== 'purchase')
        |  return(true)
        |end
        |@segment pro_users
        |if plan.ever(== 'pro')
        |  return(true)
        |end
        |""".stripMargin
    // the engine's answer (forced through the standard pass)
    val engine = graft.osl.OslEngine.segments(
        api.catalog.events("shop"), script, now = now)
      .groupBy("segment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = api.querySegment("shop", script, nowMs = now)
    assert(got.contains(s"""{"segment":"buyers","count":${engine("buyers")}}"""), got)
    assert(got.contains(s"""{"segment":"pro_users","count":${engine("pro_users")}}"""), got)
    assert(engine("buyers") == 4L && engine("pro_users") == 4L)
    // a zero-population lookup renders 0, not a missing entry
    val none = api.querySegment("shop",
      "@segment ghosts\nif event.ever(== 'refund')\n  return(true)\nend\n", nowMs = now)
    assert(none.contains("""{"segment":"ghosts","count":0}"""), none)
    // NON-countable shapes (range compare, funnels) keep the engine route
    // and stay correct
    val mixed = api.querySegment("shop",
      """@segment big_spenders
        |if value.ever(> 8)
        |  return(true)
        |end
        |""".stripMargin, nowMs = now)
    assert(mixed.contains("""{"segment":"big_spenders","count":3}"""), mixed)
  }

  test("soak: concurrent index reads during inserts/DDL/vacuum never fail or lie") {
    // the membership-soak discipline pointed at PropIndex: reader threads
    // hammer queryProperty/querySegment while a writer interleaves inserts
    // (each triggering incremental re-index on next read), a property add,
    // and an explicit vacuum; readers must never throw (manifest snapshot
    // isolation + grace-window retires) and every answer must be a count
    // the model could have produced at SOME prefix of the writes
    // (monotonically growing per-event counts — inserts only add persons).
    val api = freshApi()
    mkTable(api, buckets = 4)
    api.insert("shop", (0 until 8).map(u =>
      ev(s"u$u", u * 1000L, "view", 1.0, "free")), nowMs = now)
    api.queryProperty("shop", "event"): Unit // seed the index
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val viewCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val readers = (1 to 3).map { r =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            val js = api.queryProperty("shop", "event")
            val m = """"value":"view","customers":(\d+)""".r
              .findFirstMatchIn(js)
            m.foreach(g => viewCounts.add(g.group(1).toLong))
            api.querySegment("shop",
              "@segment viewers\nif event.ever(== 'view')\n  return(true)\nend\n",
              nowMs = now): Unit
          }
        } catch { case t: Throwable => failures.add(t); () }
      }, s"pidx-reader-$r")
    }
    readers.foreach(_.start())
    try {
      for (wave <- 1 to 6) {
        api.insert("shop", (0 until 4).map(u =>
          ev(s"w${wave}_u$u", wave * 100000L + u * 1000L, "view", 1.0, "free")),
          nowMs = now)
        if (wave == 3) api.propertyAdd("shop", PropDef(s"px$wave", "int"))
        if (wave == 5) api.catalog.vacuumExpired("shop", nowMs = now): Unit
        Thread.sleep(150)
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }
    assert(failures.isEmpty, s"concurrent index reads failed: ${failures.peek()}")
    // monotone view-person counts: 8 initially, +4 per wave, never between
    val seen = viewCounts.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    val legal = (0 to 6).map(w => 8L + 4L * w).toSet
    assert(seen.nonEmpty && seen.subsetOf(legal),
      s"reader saw an impossible count: ${seen -- legal}")
    // final state exact, including through a cold restart
    val api2 = new Api(spark, api.warehouse)
    val finalJs = api2.queryProperty("shop", "event")
    assert(finalJs.contains(""""value":"view","customers":32"""), finalJs)
  }

  test("soak (dated): concurrent reads during per-date postings refresh + srcgen-loss recovery") {
    // the undated soak pointed at the round-17 postings tier: every wave
    // writes a NEW date (one fresh cell per touched bucket), wave 3
    // deletes srcgen.json mid-flight (forcing a full postings+counts
    // rebuild under live readers), wave 5 vacuums. Readers must never
    // throw and every count must be one a write-prefix could produce.
    val api = freshApi()
    api.tableCreate(TableMeta("shopd2",
      Seq(PropDef("value", "double"), PropDef("plan", "text")),
      TableSettings(storageBuckets = 4, datePartition = true)))
    val day = 86400000L
    def evd(id: String, d: Int, off: Long) =
      s"""{"id":"$id","stamp":${now + d * day + off},"event":"view",""" +
        s""""value":1.0,"plan":"free"}"""
    api.insert("shopd2", (0 until 8).map(u => evd(s"u$u", 0, u * 1000L)),
      nowMs = now)
    api.queryProperty("shopd2", "event"): Unit // seed the index
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val viewCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val readers = (1 to 3).map { r =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            val js = api.queryProperty("shopd2", "event")
            """"value":"view","customers":(\d+)""".r
              .findFirstMatchIn(js)
              .foreach(g => viewCounts.add(g.group(1).toLong))
          }
        } catch { case t: Throwable => failures.add(t); () }
      }, s"pidxd-reader-$r")
    }
    readers.foreach(_.start())
    try {
      for (wave <- 1 to 6) {
        api.insert("shopd2", (0 until 4).map(u =>
          evd(s"w${wave}_u$u", wave, u * 1000L)), nowMs = now + wave * day)
        if (wave == 3)
          new java.io.File(api.warehouse,
            "shopd2/propindex/srcgen.json").delete(): Unit
        if (wave == 5)
          api.catalog.vacuumExpired("shopd2", nowMs = now + 5 * day): Unit
        Thread.sleep(150)
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }
    assert(failures.isEmpty, s"concurrent dated-index reads failed: ${failures.peek()}")
    val seen = viewCounts.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    val legal = (0 to 6).map(w => 8L + 4L * w).toSet
    assert(seen.nonEmpty && seen.subsetOf(legal),
      s"reader saw an impossible count: ${seen -- legal}")
    // one settled read so the index reflects the LAST wave before the
    // structural assert — on a loaded host every reader iteration can
    // outlast the 150 ms pacing, leaving no read that observed wave 6
    // (the refresh is pull-based; an unobserved final insert is legal)
    assert(api.queryProperty("shopd2", "event")
      .contains(""""value":"view","customers":32"""))
    // the postings tier really is per-date: one cell per written date
    val p = TableCommit.read(new java.io.File(api.warehouse,
      "shopd2/propindex/postings").toString).get
    val dates = p.buckets.values.flatten.map(_.takeWhile(_ != '/')).toSet
    assert(dates.size == 7, s"expected 7 per-date postings cells: $dates")
    // final state exact through a cold restart
    val api2 = new Api(spark, api.warehouse)
    assert(api2.queryProperty("shopd2", "event")
      .contains(""""value":"view","customers":32"""))
  }

  test("fallbacks: pending WAL, set props, bucket=, named segments stay scan-served") {
    val api = freshApi()
    mkTable(api)
    api.insert("shop", (0 until 6).map(u =>
      ev(s"u$u", u * 1000L, "view", u.toDouble, "free")), nowMs = now)
    // pending WAL (flush_rows high): raw rows visible via overlay, so the
    // answer must INCLUDE them -> index path must decline
    api.catalog.updateSettings("shop", _.copy(flushRows = 1000))
    api.insert("shop", Seq(ev("u9", 0L, "ping", 9.0, "pro")), nowMs = now)
    val got = api.queryProperty("shop", "event")
    assert(got.contains(""""value":"ping","customers":1"""), got)
    api.catalog.flush("shop")
    // set-valued props can't index; the scan path serves them
    val setQ = api.queryProperty("shop", "tags")
    assert(setQ.startsWith("["), setQ)
    // numeric bucket= falls back (merged values need row-level distincts)
    val bucketed = api.queryProperty("shop", "value", bucket = Some(2.0))
    assert(bucketed.contains(""""value":0,"customers":"""), bucketed)
  }
}

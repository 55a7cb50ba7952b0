package graft

import graft.osl._

/** Round-8 Tier A feature: accumulators on 2-level continue().next()
  * chains — increments lead the TOP body, reads below the chain step
  * observe the SPAWNING visit's running value, and a row is visited once
  * per visited spawn strictly before it (so a read-keyed tally can land
  * one row in SEVERAL nodes — one per distinct spawn value — while tally
  * dedup stays per (row, node)). Tier B is the authority. */
class TierChainAccumSpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val H = 3600000L

  // unique stamps per person (chain semantics are order-dependent)
  private lazy val world = {
    val rnd = new scala.util.Random(13)
    val events = Seq("purchase", "view", "signup", "error")
    val products = Seq("rod", "reel", "net", "fly")
    (0 until 60).map { i =>
      (s"u${i % 5}", Mon + (i / 5) * 5 * H + (i % 5) * H,
        events(rnd.nextInt(4)), products(rnd.nextInt(4)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }.toDF("id", "stamp", "event", "product_name", "product_price").cache()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Vector[String]] = {
    val cols = df.columns
    df.collect().map(r => cols.indices.map(i =>
      Option(r.get(i)).map {
        case d: Double => (math.round(d * 10000) / 10000.0).toString
        case o => o.toString
      }.orNull).toVector).toSet
  }

  // a DENSER world for the round-11 interval/boundary machinery: 3 people
  // with 60 rows each at irregular 1–4 h spacing — deep-chain frames and
  // limits see many in-frame candidates per spawn (the 12-rows-per-person
  // default world is too thin to stress prefix/suffix boundaries)
  private lazy val worldDense = {
    val rnd = new scala.util.Random(41)
    val events = Seq("purchase", "view", "signup", "click", "error")
    val products = Seq("rod", "reel", "net", "fly")
    (0 until 3).flatMap { u =>
      var t = Mon + u * H
      (0 until 60).map { _ =>
        t += (1 + rnd.nextInt(4)) * H
        (s"d$u", t, events(rnd.nextInt(5)), products(rnd.nextInt(4)),
          math.round(rnd.nextDouble() * 10000) / 100.0)
      }
    }.toDF("id", "stamp", "event", "product_name", "product_price").cache()
  }

  private def diffOn(w: org.apache.spark.sql.DataFrame, script: String,
                     expectTierA: Boolean = true): Unit = {
    val p = Parser.program(script)
    assert(TierA.compile(p, w, Mon + 400 * H, 1800000L).isDefined == expectTierA,
      s"Tier A compile expected=$expectTierA for:\n$script")
    val a = canon(OslEngine.query(w, script, now = Mon + 400 * H))
    val b = canon(OslEngine.query(w, script, now = Mon + 400 * H,
      forceTierB = true))
    assert(a == b, s"tier mismatch:\n$script\nA=$a\nB=$b")
  }

  private def diff(script: String, expectTierA: Boolean = true): Unit = {
    val p = Parser.program(script)
    assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined == expectTierA,
      s"Tier A compile expected=$expectTierA for:\n$script")
    val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
    val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
      forceTierB = true))
    assert(a == b, s"tier mismatch:\n$script\nA=$a\nB=$b")
  }

  private val sel =
    "select\n  count id as customers\n  count event as n_rows\n  sum product_price as total\nend\n"

  test("spawn-counter read in inner tally group") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("same-node collapse: bucket(n, 2) maps distinct spawn values together") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    << bucket(n, 2), product_name
         |  end
         |end
         |""".stripMargin)
  }

  test("inner if-condition reads the spawn value") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(!= 'error')
         |    if n <= 2
         |      << 'early_spawn', event
         |    end
         |    << 'all', event
         |  end
         |end
         |""".stripMargin)
  }

  test("guarded increment at top + top tally reads + inner reads") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  if event.is(== 'purchase')
         |    n = n + 1
         |  end
         |  << 'top', n
         |  each_row.continue().next() where product_price.is(> 10)
         |    << 'chain', n
         |  end
         |end
         |""".stripMargin)
  }

  test("guard on the chain step gates which spawns count") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if product_price.is(> 30)
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("guard on the chain step READS the accumulator") {
    // regression: the guard rewrites to __acc_n and used to hit
    // UNRESOLVED_COLUMN — chainWitnesses compiled it before chainPlan
    // materialized the accumulator windows
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if n > 2
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // read mixed with a row prop, and a bucketed tally key
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if n <= 3 && product_price.is(> 5)
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << bucket(n, 2), event
         |    end
         |  end
         |end
         |""".stripMargin)
    // reverse top: the spawn's running value accumulates from the end
    diff(
      s"""${sel}n = 0
         |each_row.reverse() where event.is(!= 'error')
         |  n += 1
         |  if n > 1
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("top .limit and .reverse compose with chain reads") {
    diff(
      s"""${sel}n = 0
         |each_row.limit(3) where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << bucket(n, 3), event
         |  end
         |end
         |""".stripMargin)
    diff(
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'view')
         |  n += 2
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("reverse int-literal chains ride the ordinal path (round 11)") {
    // the spawn SET is direction-independent; a reverse top only remaps
    // the eligible prefix to backward ordinals T−K+1..T — so literal
    // increments need no collected array and no row-bound probe
    val script =
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'view')
         |  n += 2
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin
    val c = TierA.compile(Parser.program(script), world, Mon + 100 * H, 1800000L)
    assert(c.isDefined)
    assert(!c.get.queryExecution.executedPlan.toString.contains("collect_list"),
      "reverse literal chain must ride the ordinal path, not a collect")
    diff(script)
  }

  test("reverse top with FLOATING-POINT accumulator (round 11)") {
    // the chain-witness accumulator runs over a __rn-DESC running frame:
    // Spark streams it in the interpreter's backward fold order, so
    // non-literal (fp) increments stay bit-exact under a reverse top
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  each_row.continue().next() where event.is(== 'view')
         |    << bucket(spend, 40), event
         |  end
         |end
         |""".stripMargin)
    // guarded fp increment + reverse .limit (visits = LAST n matches)
    diff(
      s"""${sel}spend = 0
         |each_row.reverse().limit(4) where event.is(!= 'error')
         |  if product_price.is(> 20)
         |    spend += product_price
         |  end
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << bucket(spend, 60), event
         |  end
         |end
         |""".stripMargin)
    // depth 3 under a reverse top: the reachability ladder is
    // direction-independent; the backward fold rides the same DESC frame
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(== 'signup')
         |  spend += product_price
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << bucket(spend, 50), event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("inner .limit(n) composes: per-spawn match-count eligibility") {
    for (lim <- Seq(1, 2)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next().limit($lim) where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin)
    }
  }

  test("inner frames compose: per-spawn stamp eligibility") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().look_ahead(12_hours) where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // frame + limit together
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 2
         |  each_row.continue().next().look_ahead(18_hours).limit(1) where product_price.is(> 10)
         |    << bucket(n, 3), event
         |  end
         |end
         |""".stripMargin)
    // contra-directional frame (look_back on a forward step): honest empty
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().look_back(6_hours) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // absolute bounds fold into the level predicate, spawn-independent
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().range('2024-01-01T06:00:00Z', '2024-01-02T12:00:00Z') where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("memory guard: residual collect shapes decline above the row bound") {
    // a GUARDED unframed chain accum takes the collect path; above the
    // per-person row bound it must fall back to Tier B (whose per-person
    // streaming scan has no O(spawns) window state)
    val script =
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if product_price.is(> 30)
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin
    val saved = TierA.maxCollectSpawnRows
    try {
      TierA.maxCollectSpawnRows = 5L // world has 12 rows per person
      assert(TierA.compile(Parser.program(script), world, Mon + 100 * H,
        1800000L).isEmpty, "collect path must decline above the row bound")
      // the ORDINAL path needs no collect: it stays Tier A under the bound
      val ordinalScript =
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin
      assert(TierA.compile(Parser.program(ordinalScript), world, Mon + 100 * H,
        1800000L).isDefined, "ordinal path is exempt from the bound")
      // and a FINITE-framed inner step is range-bounded: also exempt
      val framedScript =
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next().look_ahead(12_hours) where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin
      assert(TierA.compile(Parser.program(framedScript), world, Mon + 100 * H,
        1800000L).isDefined, "range-bounded collect is exempt from the bound")
    } finally TierA.maxCollectSpawnRows = saved
    diff(script) // and at the default bound it still compiles + matches
  }

  test("row-bound cache never crosses frames: same schema, different data") {
    // round-10 ADVICE fix: the memory-safety probe cache must key frames
    // apart even when their plans stringify identically (LocalRelation
    // prints only the schema) — a shared entry could admit the collect
    // plan on a frame past the bound, or decline a safe one.
    val guarded =
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if product_price.is(> 30)
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin
    // same 5-column schema as `world`, but only 4 rows per person
    val small = (0 until 20).map { i =>
      (s"u${i % 5}", Mon + i * H, Seq("purchase", "view")(i % 2), "rod", 50.0)
    }.toDF("id", "stamp", "event", "product_name", "product_price")
    val saved = TierA.maxCollectSpawnRows
    try {
      TierA.maxCollectSpawnRows = 5L
      // prime the cache with the SAFE frame (bound 4 ≤ 5 → compiles)…
      assert(TierA.compile(Parser.program(guarded), small, Mon + 100 * H,
        1800000L).isDefined, "4 rows/person is under the bound")
      // …then the 12-rows/person frame must still decline immediately
      assert(TierA.compile(Parser.program(guarded), world, Mon + 100 * H,
        1800000L).isEmpty, "a cached bound from another frame must not leak")
      // and the safe frame keeps compiling after the unsafe probe cached
      assert(TierA.compile(Parser.program(guarded), small, Mon + 100 * H,
        1800000L).isDefined)
    } finally TierA.maxCollectSpawnRows = saved
  }

  test("row-bound cache re-probes when the file listing grows (round 11)") {
    // the canonical plan string pins scan DIRECTORIES, not contents: a raw
    // directory that gains files keeps the same canonical plan, and a low
    // cached bound would ride through the memory gate for the whole TTL.
    // Round 11 keys the cache on the resolved file listing: growth is a
    // cache MISS, so the over-bound data declines immediately.
    val guarded =
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  if product_price.is(> 30)
         |    each_row.continue().next() where event.is(== 'view')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft-rowbound").toString
    def rows(n: Int, part: Int) = (0 until n).map { i =>
      (s"u${i % 5}", Mon + (part * 1000 + i) * H, Seq("purchase", "view")(i % 2),
        "rod", 50.0)
    }.toDF("id", "stamp", "event", "product_name", "product_price")
    rows(20, 0).coalesce(1).write.mode("append").parquet(dir) // 4 rows/person
    val saved = TierA.maxCollectSpawnRows
    try {
      TierA.maxCollectSpawnRows = 5L
      assert(TierA.compile(Parser.program(guarded), spark.read.parquet(dir),
        Mon + 10000 * H, 1800000L).isDefined, "4 rows/person is under the bound")
      // grow the SAME directory past the bound (now 12 rows/person)
      rows(40, 1).coalesce(1).write.mode("append").parquet(dir)
      assert(TierA.compile(Parser.program(guarded), spark.read.parquet(dir),
        Mon + 10000 * H, 1800000L).isEmpty,
        "growth under the same path must invalidate the cached row bound")
    } finally TierA.maxCollectSpawnRows = saved
  }

  test("depth-3 framed/guarded inner steps compile (round 11)") {
    // FRAMED first inner step: spawning level-1 matches are bounded by
    // (s0, s0+span1] — the tuple's rangeBetween endpoint count
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().look_ahead(12_hours) where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // FRAMED deepest step: s1 must sit within [r−span2, r)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next().look_ahead(24_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // BOTH framed + tallies at level 1 too
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().look_ahead(36_hours) where event.is(== 'view')
         |    << bucket(n, 2), event
         |    each_row.continue().next().look_ahead(24_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // TIGHT frames — smaller than the world's 5 h row spacing, so most
    // intervals are EMPTY: pins the min/max endpoint arithmetic at the
    // boundary (1 h reaches nothing; 5 h reaches only the adjacent row)
    for (span <- Seq("1_hours", "5_hours", "10_hours")) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next().look_ahead($span) where event.is(== 'view')
           |    each_row.continue().next().look_ahead($span) where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // GUARDED spawn from level 1 (row-prop guard, evaluated at s1)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  if product_price.is(> 30)
         |    each_row.continue().next() where event.is(== 'view')
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // guard at BOTH levels + frame + fp accumulator + reverse top: the
    // full round-11 composition
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  if product_price.is(> 10)
         |    each_row.continue().next().look_ahead(60_hours) where event.is(== 'view')
         |      if product_price.is(> 20)
         |        each_row.continue().next().look_ahead(48_hours) where event.is(== 'purchase')
         |          << bucket(spend, 70), event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("depth-3 inner .limit(n) composes (round 11)") {
    // limit on the INTERMEDIATE step: only the first n views after each
    // signup can spawn the deepest scan — an ordinal upper bound
    // C(s1) ≤ C(s0)+n, one more min-term over the upper endpoint counts
    for (lim <- Seq(1, 2, 3)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next().limit($lim) where event.is(== 'view')
           |    each_row.continue().next() where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // intermediate limit + frames on both steps + level-1 tallies
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().look_ahead(36_hours).limit(2) where event.is(== 'view')
         |    << bucket(n, 2), event
         |    each_row.continue().next().look_ahead(24_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // limit on the DEEPEST step: each view scans only its first m
    // purchases — reach via the running-max C₂ lookup at the interval's
    // upper endpoint (G(r⁻) alone when the first hop is unframed)
    for (lim <- Seq(1, 2)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    each_row.continue().next().limit($lim) where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // deepest limit + GUARDED deepest step + both frames: G counts
    // spawning (pred1 ∧ guard2) matches and __ghi rides the tuple
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().look_ahead(60_hours) where event.is(== 'view')
         |    if product_price.is(> 20)
         |      each_row.continue().next().look_ahead(48_hours).limit(1) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // deepest limit + fp accumulator + reverse top (full composition)
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  each_row.continue().next().look_ahead(60_hours) where event.is(== 'view')
         |    each_row.continue().next().limit(2) where event.is(== 'purchase')
         |      << bucket(spend, 70), event
         |    end
         |  end
         |end
         |""".stripMargin)
    // tight frame + limit 1 at the boundary (adjacent-row reach only)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().look_ahead(5_hours).limit(1) where event.is(== 'view')
         |    each_row.continue().next().look_ahead(5_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("accumulator-reading deepest-step guards + depth-4 guards (round 11)") {
    // spawn-pure guard on the deepest step of a depth-3 chain: the
    // interpreter evaluates it mid-nested-scan, where the accumulator
    // still holds the SPAWN's running value (increments lead the top
    // body) — so it factors out of the row counting and evaluates per
    // collected tuple / ordinal with the spawn binds
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if n <= 2
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // mixed guard: the accum conjunct splits from the row-prop conjunct
    // (row part folds into the count predicate, spawn part per tuple)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if n > 1 && product_price.is(> 10)
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // frames + spawn-pure guard + deepest limit compose
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().look_ahead(36_hours) where event.is(== 'view')
         |    if n <= 3
         |      each_row.continue().next().look_ahead(24_hours).limit(1) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // spawn-pure guard + INTERMEDIATE limit: the count spaces coincide
    // (the spawn-pure part never constrains rows), so lim1 composes
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().limit(2) where event.is(== 'view')
         |    if n != 2
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-4: row-prop guards on middle AND deepest steps fold into
    // the reachability-ladder window predicates
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(!= 'error')
         |    if product_price.is(> 20)
         |      each_row.continue().next() where event.is(== 'view')
         |        if product_price.is(> 10)
         |          each_row.continue().next() where event.is(== 'purchase')
         |            << n, event
         |          end
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-4: spawn-pure guard on the deepest step + fp accumulator
    // (collect path — real values in the tuples)
    diff(
      s"""${sel}spend = 0
         |each_row where event.is(!= 'error')
         |  spend += product_price
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where product_price.is(> 5)
         |      if spend > 100
         |        each_row.continue().next() where event.is(== 'purchase')
         |          << bucket(spend, 100), event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // reverse top + spawn-pure guard: backward ordinals carry the
    // backward-scan accumulator values into the guard
    diff(
      s"""${sel}n = 0
         |each_row.reverse() where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if n > 2
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // a single conjunct mixing an accum read with a row prop was the
    // round-11 decline here; it COMPILES since rounds 12-14 (the mixed
    // ordinal-bound fold — round 14 extends it to bare DOUBLE props via
    // exact floor/ceil inclusive bounds)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if product_price.is(> n)
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("depth-4+ deepest-step frames and limits compile (round 11)") {
    // framed deepest step at depth 4: the final ladder window becomes
    // rangeBetween(-span, -1) — "some valid click within 30h before r"
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(!= 'error')
         |      each_row.continue().next().look_ahead(30_hours) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // limited deepest step at depth 4: spawn-independent G conjunct
    for (lim <- Seq(1, 2)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    each_row.continue().next() where event.is(!= 'error')
           |      each_row.continue().next().limit($lim) where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // frame + limit + split guards together at depth 4
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if product_price.is(> 10)
         |      each_row.continue().next() where event.is(== 'signup')
         |        if n <= 4
         |          each_row.continue().next().look_ahead(40_hours).limit(1) where event.is(== 'purchase')
         |            << n, event
         |          end
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-3 deepest-only frame/limit rides the ordinal path (the
    // intermediate step is plain, so no interval counts are needed)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next().look_ahead(20_hours).limit(1) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // fp accumulator (collect path) + framed deepest at depth 4
    diff(
      s"""${sel}spend = 0
         |each_row where event.is(!= 'error')
         |  spend += product_price
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where product_price.is(> 5)
         |      each_row.continue().next().look_ahead(30_hours).limit(2) where event.is(== 'purchase')
         |        << bucket(spend, 100), event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // reverse top + limited deepest at depth 4 (direction-independent)
    diff(
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(!= 'error')
         |      each_row.continue().next().limit(1) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth 5, tight frame at the boundary
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'signup')
         |      each_row.continue().next() where event.is(== 'click')
         |        each_row.continue().next().look_ahead(5_hours) where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // decline: a MIDDLE step limited at depth 4 (its cap couples spawn
    // and hop ordinals across two intermediate levels)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().limit(2) where event.is(== 'view')
         |    each_row.continue().next() where event.is(!= 'error')
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin, expectTierA = false)
  }

  test("REVERSE inner steps below chain accumulators (round 11)") {
    // the reverse scan visits rows BEFORE the spawn: tuples collect over
    // the FOLLOWING window, each visited row observes its spawn's value
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase')
         |  n += 1
         |  each_row.continue().next().reverse() where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // aligned frame (look_back points WITH a reverse scan): range-bounds
    // the FOLLOWING collect window
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase')
         |  n += 1
         |  each_row.continue().next().reverse().look_back(24_hours) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // limit: the nearest k preceding matches (rev __mc1 counts from the
    // right; the subtraction is direction-agnostic)
    for (lim <- Seq(1, 2)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next().reverse().limit($lim) where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin)
    }
    // contra frame (look_ahead AGAINST the reverse scan): honestly empty
    // on tie-free data
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase')
         |  n += 1
         |  each_row.continue().next().reverse().look_ahead(12_hours) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // fp accumulator + frame + limit + guard, and a REVERSE top over a
    // reverse inner step (tuples carry real values — direction-agnostic)
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  if product_price.is(> 10)
         |    each_row.continue().next().reverse().look_back(36_hours).limit(2) where event.is(== 'view')
         |      << bucket(spend, 80), event
         |    end
         |  end
         |end
         |""".stripMargin)
    // mixed-direction depth-3 chains compile since round 12 — positive
    // coverage in "REVERSE and RESTART middle steps below depth-3
    // accumulators (round 12)" (the dense-world variants) and below on
    // the default world
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().reverse() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test(".from(k) restart steps below chain accumulators (round 11)") {
    // every spawn rescans the same absolute tail: a row is visited once
    // per spawn (before OR after it), observing that spawn's value
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(0) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // nonzero floor + .next() offset
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.from(3) where event.is(== 'purchase')
         |    << bucket(n, 2), event
         |  end
         |end
         |""".stripMargin)
    // look_back frame: visits within b BEFORE each spawn (spawns collect
    // from the row's FUTURE side)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase')
         |  n += 1
         |  each_row.from(0).look_back(24_hours) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // look_ahead frame: visits within a AFTER each spawn
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(0).look_ahead(24_hours) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // within frame: both sides of the spawn
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(0).within(18_hours, stamp) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // unframed limit: the fixed sequence's first k matches past the floor
    for (lim <- Seq(1, 3)) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.from(1).limit($lim) where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin)
    }
    // guarded spawn + fp accumulator + reverse top
    diff(
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  if product_price.is(> 10)
         |    each_row.from(0).look_back(30_hours) where event.is(== 'view')
         |      << bucket(spend, 80), event
         |    end
         |  end
         |end
         |""".stripMargin)
    // dense world: from-floor + frame with many candidates
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(5).within(10_hours, stamp) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("round-11 shapes on a dense world: Tier A == Tier B (grid)") {
    // depth-3 intermediate-step limits × deepest frames: many in-frame
    // views per signup stress the ordinal-capped interval endpoints
    for (mid <- Seq(".limit(2)", ".look_ahead(9_hours).limit(1)", ".limit(4)");
         deepF <- Seq("", ".look_ahead(7_hours)")) {
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next()$mid where event.is(== 'view')
           |    each_row.continue().next()$deepF where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // depth-3 deepest-step limits × intermediate frames (G-lookup path)
    for (deep <- Seq(".limit(1)", ".look_ahead(8_hours).limit(2)");
         midF <- Seq("", ".look_ahead(12_hours)")) {
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(!= 'error')
           |  n += 1
           |  each_row.continue().next()$midF where event.is(== 'view')
           |    each_row.continue().next()$deep where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // depth-4 deepest frames/limits + split guards (ordinal ladder with
    // a range-bounded final window and the __cdc/__gd conjunct)
    for (deep <- Seq(".look_ahead(10_hours)", ".limit(1)",
                     ".look_ahead(14_hours).limit(2)")) {
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    if product_price.is(> 15)
           |      each_row.continue().next() where event.is(== 'click')
           |        if n <= 6
           |          each_row.continue().next()$deep where event.is(== 'purchase')
           |            << n, event
           |          end
           |        end
           |      end
           |    end
           |  end
           |end
           |""".stripMargin)
    }
    // reverse inner steps: dense preceding-match runs stress the
    // FOLLOWING collect and the rev match-count subtraction
    for (mods <- Seq(".reverse()", ".reverse().look_back(9_hours)",
                     ".reverse().limit(3)",
                     ".reverse().look_back(14_hours).limit(2)")) {
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'purchase')
           |  n += 1
           |  each_row.continue().next()$mods where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin)
    }
    // fp accumulator + reverse top over the dense world (collect paths)
    diffOn(worldDense,
      s"""${sel}spend = 0
         |each_row.reverse() where event.is(!= 'error')
         |  spend += product_price
         |  each_row.continue().next().look_ahead(11_hours) where event.is(== 'view')
         |    each_row.continue().next().look_ahead(9_hours).limit(1) where event.is(== 'purchase')
         |      << bucket(spend, 150), event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("REVERSE and RESTART deepest steps below depth-3 accumulators (round 12)") {
    // reverse deepest: signup -> view (forward) -> purchases BEFORE the
    // view — the s1 interval flips to (r, r+b] and reach is the same
    // monotone-endpoint count with the upper endpoint on the row's
    // future side
    def rev3(midMods: String, deepMods: String,
             expectTierA: Boolean = true): Unit =
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next()$midMods where event.is(== 'view')
           |    each_row.continue().next().reverse()$deepMods where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    rev3("", "")
    rev3("", ".look_back(9_hours)")
    rev3(".look_ahead(12_hours)", ".look_back(8_hours)")
    rev3(".look_ahead(20_hours)", "")
    rev3(".limit(2)", ".look_back(10_hours)") // mid limit composes (min-term)
    // round 14: a FRAMED reverse deepest + .limit(m) compiles (ordinal
    // path): valid hops are a prefix of the following mids while K grows
    // with later hops, so reach is the exact max over the filtered hop
    // set, collected over the frame-bounded following window
    rev3("", ".look_back(10_hours).limit(1)")
    rev3("", ".look_back(24_hours).limit(2)")
    rev3("", ".look_back(9_hours).limit(3)")
    // pinned declines: an UNFRAMED limit on the reversed step (the hop
    // collect would be unbounded), a look_ahead on it (contra side), and
    // a mid limit alongside (mid limits leave the ordinal path)
    rev3("", ".limit(1)", expectTierA = false)
    rev3("", ".look_ahead(6_hours)", expectTierA = false)
    rev3(".limit(2)", ".look_back(10_hours).limit(1)", expectTierA = false)

    // restart deepest: signup -> view -> rescan from row k, frame
    // anchored at the view — s1 ∈ [r−a, r+b] from the inverted frame,
    // plus the spawn-independent index floor
    def from3(deepMods: String, expectTierA: Boolean = true): Unit =
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    each_row.from(2)$deepMods where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    from3(".look_back(24_hours)")
    from3(".look_ahead(18_hours)")
    from3(".within(15_hours, stamp)")
    from3("") // unframed: every spawn sees the whole fixed tail
    // framed mid + restart deepest
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next().look_ahead(16_hours) where event.is(== 'view')
         |    each_row.from(0).look_back(20_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // round 14: an UNFRAMED restart deepest + .limit(m) compiles — every
    // hop rescans the identical floored tail, so the limit is one
    // row-level count conjunct (r among the first m floored deep matches)
    from3(".limit(1)")
    from3(".limit(2)")
    // round 15: a FRAMED limit on the restart deepest compiles — per-hop
    // sequences diverge, but each hop's rank is exact arithmetic
    // (C'(r) − G(y), the (G, K) collect branch)
    from3(".look_back(24_hours).limit(2)")
    from3(".look_ahead(18_hours).limit(1)")
    from3(".within(15_hours, stamp).limit(2)")
  }

  test("REVERSE and RESTART middle steps below depth-3 accumulators (round 12)") {
    // the MID step scans the spawn's other side (reverse) or the fixed
    // absolute tail (restart): the s1 interval's endpoints move to the
    // SPAWN side, priced by tuple-side endpoint windows; a restart's
    // index floor folds into the count predicate
    def mid3(midStep: String, deepMods: String = "", midTally: Boolean = false,
             expectTierA: Boolean = true): Unit = {
      val mt = if (midTally) "    << n, 'mid'\n" else ""
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  $midStep where event.is(== 'view')
           |$mt    each_row.continue().next()$deepMods where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    }
    mid3("each_row.continue().next().reverse()")
    mid3("each_row.continue().next().reverse().look_back(20_hours)")
    mid3("each_row.continue().next().reverse().look_back(14_hours)",
      deepMods = ".look_ahead(10_hours)")
    // level-1 tallies under a reverse mid exercise the explicit
    // scan-direction ordering (two-sided collect windows)
    mid3("each_row.continue().next().reverse().look_back(16_hours)",
      deepMods = ".look_ahead(12_hours)", midTally = true)
    mid3("each_row.from(1).look_back(24_hours)")
    mid3("each_row.from(0).look_ahead(18_hours)", deepMods = ".look_ahead(9_hours)")
    mid3("each_row.from(2).within(15_hours, stamp)")
    mid3("each_row.from(1)") // unframed restart: no lower endpoint at all
    mid3("each_row.from(0).look_back(20_hours)", midTally = true)
    // mid limits by direction (round 12): reverse — the n closest
    // matches below the spawn are a lower-endpoint max-term
    mid3("each_row.continue().next().reverse().limit(2)")
    mid3("each_row.continue().next().reverse().look_back(18_hours).limit(2)")
    mid3("each_row.continue().next().reverse().limit(1)",
      deepMods = ".look_ahead(10_hours)")
    // restart — UNFRAMED only: every spawn sees the identical floored
    // sequence, so the cap folds into the counted predicate
    mid3("each_row.from(1).limit(3)")
    mid3("each_row.from(0).limit(2)", deepMods = ".look_ahead(12_hours)")
    // BOTH steps non-forward (round 12): the endpoint assembly is
    // modular — mid terms and deep terms compose freely
    mid3("each_row.continue().next().reverse().look_back(20_hours)",
      deepMods = ".reverse().look_back(10_hours)")
    mid3("each_row.continue().next().reverse()", deepMods = ".reverse()")
    mid3("each_row.from(1).look_back(20_hours)",
      deepMods = ".reverse().look_back(8_hours)")
    mid3("each_row.continue().next().reverse().look_back(16_hours)",
      deepMods = ".look_ahead(9_hours)", midTally = true)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().reverse().look_back(22_hours) where event.is(== 'view')
         |    each_row.from(1).look_back(14_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // round 15: a FRAMED restart-mid limit compiles (per-spawn sequences
    // diverge, but the rank is one more min-term n + G(s0) — see the
    // round-15 framed-restart test); still pinned: a deep limit under a
    // non-forward mid (the G lookup needs forward-forward count spaces)
    mid3("each_row.from(1).look_back(24_hours).limit(1)")
    mid3("each_row.continue().next().reverse().look_back(20_hours)",
      deepMods = ".look_ahead(10_hours).limit(1)", expectTierA = false)
    // level-1 tallies under reverse/restart DEEPEST steps (the mid is
    // forward but the collect window is two-sided — same ordering fix)
    for (deep <- Seq("each_row.continue().next().reverse().look_back(12_hours)",
                     "each_row.from(1).look_back(18_hours)"))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    << n, 'mid'
           |    $deep where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
  }

  test("REVERSE/RESTART deepest steps at depth 4 (ladder window flips)") {
    // hop validity is K-monotone in the hop row in ANY direction, so the
    // final reachability-ladder window just flips to the following side
    // (reverse) or brackets the row (restart) — still collect-free on
    // the ordinal path
    def deep4(deepStep: String, midTally: Boolean = false,
              expectTierA: Boolean = true): Unit = {
      val mt = if (midTally) "      << n, 'mid'\n" else ""
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    each_row.continue().next() where event.is(== 'click')
           |$mt      $deepStep where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    }
    deep4("each_row.continue().next().reverse()")
    deep4("each_row.continue().next().reverse().look_back(14_hours)")
    deep4("each_row.from(1).look_back(20_hours)")
    deep4("each_row.from(0).look_ahead(16_hours)")
    deep4("each_row.from(2)")
    deep4("each_row.continue().next().reverse().look_back(12_hours)",
      midTally = true)
    // round 14: non-forward deepest LIMITS compose at depth 4 too —
    // framed reverse (filtered hop max) and unframed restart (row-level
    // floored-count conjunct)
    deep4("each_row.continue().next().reverse().look_back(14_hours).limit(2)")
    deep4("each_row.continue().next().reverse().look_back(20_hours).limit(1)")
    deep4("each_row.from(1).limit(2)")
    deep4("each_row.from(0).limit(1)")
    // pinned decline: an UNFRAMED reverse limit (unbounded hop collect)
    deep4("each_row.continue().next().reverse().limit(1)", expectTierA = false)
    // round 15: a FRAMED restart limit at depth 4 compiles — per-hop
    // sequences diverge, but each hop's rank is C'(r) − G(y) exactly
    deep4("each_row.from(1).look_back(20_hours).limit(2)")
    deep4("each_row.from(0).look_ahead(16_hours).limit(1)")
    // depth-3 rev/from deepest with constant increments now rides the
    // ORDINAL path (collect-free) — re-pin the canonical shapes there
    for (deep <- Seq("each_row.continue().next().reverse().look_back(24_hours)",
                     "each_row.from(1).look_back(24_hours)"))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    $deep where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
  }

  test("framed / reverse / restart MIDDLE steps at depth 4 (round 14)") {
    // round 14: middle levels (2..size−2) ride the per-level hopWin —
    // each level's reach set stays a spawn PREFIX under any direction,
    // so the max-ladder composes. Previously middles were gated plain.
    def mid4(midStep: String, deepStep: String =
               "each_row.continue().next()", guard: String = "",
             midTally: Boolean = false,
             expectTierA: Boolean = true): Unit = {
      val g = if (guard.isEmpty) "" else s"    if $guard\n"
      val gEnd = if (guard.isEmpty) "" else "    end\n"
      val mt = if (midTally) "      << n, 'mid'\n" else ""
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |$g    $midStep where event.is(== 'click')
           |$mt      $deepStep where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |$gEnd  end
           |end
           |""".stripMargin, expectTierA)
    }
    // framed forward middle (previously Tier B at depth >= 4)
    mid4("each_row.continue().next().look_ahead(30_hours)")
    mid4("each_row.continue().next().look_ahead(16_hours)", midTally = true)
    // reverse middle (aligned look_back; unframed = unbounded following)
    mid4("each_row.continue().next().reverse().look_back(30_hours)")
    mid4("each_row.continue().next().reverse()")
    // restart middle (unframed + framed both sides)
    mid4("each_row.from(1)")
    mid4("each_row.from(0).look_back(30_hours)")
    mid4("each_row.from(2).look_ahead(40_hours)")
    // direction mixes: non-forward middle + non-forward deepest
    mid4("each_row.continue().next().reverse().look_back(24_hours)",
      deepStep = "each_row.continue().next().reverse().look_back(20_hours)")
    mid4("each_row.from(1).look_back(30_hours)",
      deepStep = "each_row.from(0).look_ahead(24_hours)")
    // LIMITED forward middles (round 14): the latest in-frame hop
    // dominates reach AND limit validity, so the level's reach zeroes
    // under one G-conjunct — needs unframed-forward levels BELOW it
    // (monotone hop-side reach)
    mid4("each_row.continue().next().limit(2).look_ahead(40_hours)")
    mid4("each_row.continue().next().limit(1)")
    mid4("each_row.continue().next().limit(3)",
      deepStep = "each_row.continue().next().reverse().look_back(24_hours)")
    // a framed REVERSE-LIMITED deepest below a non-forward middle stays
    // sound (the filtered hop max is exact per hop, no dominance needed)
    mid4("each_row.continue().next().reverse().look_back(30_hours)",
      deepStep =
        "each_row.continue().next().reverse().look_back(20_hours).limit(2)")
    // a framed middle below a FRAMED forward limited deepest: the
    // G-lookup's dominance argument fails (sliding-window middle maxima
    // aren't monotone), so this prices per hop via the frame-bounded
    // collect (round 14) — exact at any middle mix
    mid4("each_row.continue().next().look_ahead(30_hours)",
      deepStep = "each_row.continue().next().look_ahead(20_hours).limit(2)")
    mid4("each_row.continue().next().reverse().look_back(30_hours)",
      deepStep = "each_row.continue().next().look_ahead(24_hours).limit(1)")
    // pinned DECLINE: an UNFRAMED forward limited deepest below a
    // non-plain middle (no bound for the hop collect, and the G-lookup
    // needs monotone reach below)
    mid4("each_row.continue().next().look_ahead(30_hours)",
      deepStep = "each_row.continue().next().limit(2)",
      expectTierA = false)
    // non-forward middle + MIXED guard at the deepest (ladder fold is
    // per-level, so the least() cap rides the flipped middle window)
    mid4("each_row.continue().next().reverse().look_back(30_hours)",
      guard = "get_hour(stamp) > n")
    mid4("each_row.from(1)", guard = "n < get_hour(stamp)")
    // a LIMITED unframed RESTART middle: the floored match sequence is
    // identical for every hop, so the limit is a row-level count
    // conjunct on the level's visit predicate
    mid4("each_row.from(1).limit(2)")
    mid4("each_row.from(0).limit(1)", midTally = true)
    // a LIMITED framed REVERSE middle prices exactly per hop — the same
    // filtered-hop-max collect the reverse deepest uses, at its level
    mid4("each_row.continue().next().reverse().look_back(30_hours).limit(1)")
    mid4("each_row.continue().next().reverse().look_back(24_hours).limit(2)",
      midTally = true)
    mid4("each_row.continue().next().reverse().look_back(30_hours).limit(1)",
      deepStep = "each_row.continue().next().reverse().look_back(20_hours)")
    // pinned decline: UNFRAMED reverse-middle limits (unbounded hop
    // collect)
    mid4("each_row.continue().next().reverse().limit(1)",
      expectTierA = false)
    // round 15: a FRAMED restart-middle limit compiles — per-hop rank is
    // C'(r) − G(y), the (G, K) collect branch applied at the level
    mid4("each_row.from(1).look_back(30_hours).limit(2)")
    mid4("each_row.from(0).look_ahead(20_hours).limit(1)", midTally = true)
    // contra-framed middle (forward scan + look_back)
    mid4("each_row.continue().next().look_back(30_hours)",
      expectTierA = false)
  }

  test("depth-3 direction MATRIX on the dense world: all 3x3 combos (grid)") {
    // systematic sweep: every (mid, deepest) combination of forward /
    // reverse / restart, framed and unframed variants — the endpoint
    // terms are modular, so the grid is the proof the composition holds
    // everywhere, not just in the hand-picked shapes
    val mids = Seq(
      "each_row.continue().next()",
      "each_row.continue().next().look_ahead(18_hours)",
      "each_row.continue().next().reverse()",
      "each_row.continue().next().reverse().look_back(16_hours)",
      "each_row.from(1)",
      "each_row.from(0).look_back(20_hours)")
    val deeps = Seq(
      "each_row.continue().next()",
      "each_row.continue().next().look_ahead(12_hours)",
      "each_row.continue().next().reverse().look_back(10_hours)",
      "each_row.from(1).look_ahead(14_hours)")
    for (mid <- mids; deep <- deeps)
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  $mid where event.is(== 'view')
           |    $deep where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    // unframed reverse deepest (the O(rows²)/person window class the
    // interpreter's own backward rescan shares — see SCALING.md)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next().reverse() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("depth-4 direction MATRIX: middle x deepest combos (round 14 grid)") {
    // round 14 opened MIDDLE steps to any direction on the ordinal
    // path — the systematic sweep proves the per-level hopWin composes
    // everywhere, not just in the hand-picked mid4 shapes
    val mids = Seq(
      "each_row.continue().next()",
      "each_row.continue().next().look_ahead(24_hours)",
      "each_row.continue().next().reverse()",
      "each_row.continue().next().reverse().look_back(24_hours)",
      "each_row.from(1)",
      "each_row.from(0).look_back(30_hours)")
    val deeps = Seq(
      "each_row.continue().next()",
      "each_row.continue().next().look_ahead(16_hours)",
      "each_row.continue().next().look_ahead(16_hours).limit(2)",
      "each_row.continue().next().reverse().look_back(14_hours)",
      "each_row.from(1).look_ahead(18_hours)")
    for (mid <- mids; deep <- deeps)
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    $mid where event.is(== 'click')
           |      $deep where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |  end
           |end
           |""".stripMargin)
    // depth 5 with TWO non-forward middles + a framed limited deepest:
    // the per-level hopWin and the per-hop collect compose at any depth
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'signup')
         |    each_row.continue().next().reverse().look_back(40_hours) where event.is(== 'view')
         |      each_row.from(1) where event.is(== 'click')
         |        each_row.continue().next().look_ahead(30_hours).limit(2) where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("BOTH depth-3 inner steps limited compile (round 12)") {
    // signup -> first n views -> first m purchases: the intermediate cap
    // joins the upper-endpoint min-terms (k* = the latest VALID s1's
    // ordinal) and the deep limit reads Γ(k*) — C₂ at that match — from
    // the per-row match-C₂ array (exact base-offset indexing)
    def both(midMods: String, deepMods: String, guard: Option[String] = None,
             expectTierA: Boolean = true): Unit = {
      val (gOpen, gClose) = guard.map(g => (s"if $g\n      ", "\n      end"))
        .getOrElse(("", ""))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next()$midMods where event.is(== 'view')
           |    $gOpen each_row.continue().next()$deepMods where event.is(== 'purchase')
           |      << n, event
           |    end$gClose
           |  end
           |end
           |""".stripMargin, expectTierA)
    }
    both(".limit(2)", ".limit(1)")
    both(".limit(1)", ".limit(3)")
    both(".limit(4)", ".limit(2)")
    // frames compose with both limits (min-terms + the span2-bounded
    // Γ-array window with its __loA base offset)
    both(".look_ahead(9_hours).limit(2)", ".limit(1)")
    both(".limit(2)", ".look_ahead(8_hours).limit(1)")
    both(".look_ahead(12_hours).limit(3)", ".look_ahead(10_hours).limit(2)")
    // a spawn-pure deepest guard keeps the count spaces aligned
    both(".limit(2)", ".limit(2)", guard = Some("n <= 6"))
    // pinned decline: a ROW-prop deepest guard under an intermediate
    // limit (visit count != spawning-match count)
    both(".limit(2)", ".limit(1)", guard = Some("product_price.is(> 15)"),
      expectTierA = false)
  }

  test("MIXED accum+row guard conjuncts compile on the ordinal path (round 12)") {
    // a guard comparing the SPAWN's accumulator against a row property of
    // the guarded step's row — `get_hour(stamp) > n` at the view row: the
    // j-th signup's nested scan launches the purchase scan only from
    // views whose hour exceeds j. Compiles as a per-row ordinal bound
    // folded into the reachability ladder (least(prev, hi)).
    def mixed3(guard: String, expectTierA: Boolean = true,
               init: String = "n = 0", inc: String = "n += 1",
               deepMods: String = "", deepStep: Option[String] = None): Unit =
      diffOn(worldDense,
        s"""$sel$init
           |each_row where event.is(== 'signup')
           |  $inc
           |  each_row.continue().next() where event.is(== 'view')
           |    if $guard
           |      ${deepStep.getOrElse(s"each_row.continue().next()$deepMods")} where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    // increasing accumulator: upper-bounding ops keep reach a prefix
    mixed3("get_hour(stamp) > n")
    mixed3("n < get_hour(stamp)") // flipped operand order, same bound
    mixed3("n <= get_hour(stamp)")
    // non-unit increment: the affine slope is the summed literal
    mixed3("get_hour(stamp) >= n", inc = "n += 3")
    // DECREASING accumulator: lower-bounding ops are the prefix forms
    mixed3("n > get_hour(stamp)", init = "n = 50", inc = "n -= 2")
    mixed3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 3")
    // a framed deepest step composes (the ladder window range-bounds)
    mixed3("get_hour(stamp) > n", deepMods = ".look_ahead(9_hours)")
    // spawn-pure + mixed conjuncts split per class
    mixed3("n <= 6 && get_hour(stamp) > n")
    // row-prop + mixed split
    mixed3("product_price.is(> 15) && get_hour(stamp) > n")
    // round 12: int() compiles (truncate-through-double, nil -> 0), so a
    // DOUBLE prop reaches the mixed machinery via explicit conversion
    mixed3("int(product_price) > n")
    mixed3("n < int(product_price)", inc = "n += 9")
    mixed3("int(product_price) <= n", init = "n = 80", inc = "n -= 7")
    // ...and its suffix mirror declines (R >= decreasing acc loosens
    // with later spawns — not a prefix)
    mixed3("int(product_price) >= n", init = "n = 80", inc = "n -= 7",
      expectTierA = false)
    // int() in tally groups and wheres (general marshal parity)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if int(product_price) > n
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << int(product_price / 25), event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-4: mixed at the MIDDLE step (k=2), deepest plain
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if get_hour(stamp) > n
         |      each_row.continue().next() where event.is(== 'click')
         |        each_row.continue().next() where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-4: mixed at the middle step + a LIMITED deepest step — the
    // G-lookup stays valid because last-hop validity folds the mixed
    // bound through the ladder (K monotone in the hop row)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if get_hour(stamp) > n
         |      each_row.continue().next() where event.is(== 'click')
         |        each_row.continue().next().limit(1) where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // round 14: mixed at the middle step + a REVERSE FRAMED LIMITED
    // deepest — the filtered hop max composes with the mixed least-fold
    // (K already carries the ordinal bound when the hop array collects)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if get_hour(stamp) > n
         |      each_row.continue().next() where event.is(== 'click')
         |        each_row.continue().next().reverse().look_back(24_hours).limit(2) where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // round 13 (ADVICE r12): mixed guard at the MID step composed with a
    // NON-FORWARD deepest — gate-allowed since round 12 (the mixed bound
    // folds into the ladder; lastHopWin flips/brackets the final window
    // independently), but previously untested. Reverse deepest:
    mixed3("get_hour(stamp) > n",
      deepMods = ".reverse().look_back(24_hours)")
    mixed3("get_hour(stamp) > n", deepMods = ".reverse()") // unframed too
    mixed3("n < get_hour(stamp)", inc = "n += 2",
      deepMods = ".reverse().look_back(9_hours)")
    // ...and a GENUINE `.from(k)` restart deepest (unframed + framed).
    // Round 14 adjudication of the round-13 red pin: `.from(k)` must NOT
    // ride a `.continue()` step — the interpreter resolves the scan start
    // continueFrom-first (Interpreter.execEachRow), so
    // `.continue().next().from(k)` is a plain continue step with a dead
    // `.from`; a restart step is a bare nested `each_row.from(k)`.
    mixed3("get_hour(stamp) > n", deepStep = Some("each_row.from(0)"))
    mixed3("get_hour(stamp) > n", deepStep = Some("each_row.from(2)"))
    mixed3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 2",
      deepStep = Some("each_row.from(1).look_back(24_hours)"))
    mixed3("get_hour(stamp) > n",
      deepStep = Some("each_row.from(0).look_ahead(18_hours)"))
    // what the round-13 pin actually spelled: a CONTRA-framed continue
    // deepest (forward scan + look_back — only stamp-ties can match).
    // dir3StepOk declines it at depth ≥ 3, mixed or not; Tier B answers.
    mixed3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 2",
      deepMods = ".look_back(24_hours)", expectTierA = false)
    mixed3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 2",
      deepMods = ".from(1).look_back(24_hours)", expectTierA = false)
    // affine accumulator side — COMPILES since round 13 (accShifted folds
    // the literal shift into the intercept; q_osl_mixed_shift_guard).
    // Round 13 left this pinned as a decline, masked by the then-failing
    // restart pin above (one test block — execution never reached it).
    mixed3("n + 1 < get_hour(stamp)")
    // round 14: CONTRA-direction (suffix) forms compile when the deepest
    // step is FRAMED forward — per-hop valid intervals can gap across
    // hops, so entries are the exact merged-interval union over the
    // frame-bounded hop window
    mixed3("get_hour(stamp) < n", deepMods = ".look_ahead(12_hours)")
    mixed3("n > get_hour(stamp)", deepMods = ".look_ahead(24_hours)")
    // round 15: the contra union composes with NON-FORWARD deepests —
    // the hop window flips (finite aligned reverse) or brackets (framed
    // restart), and a deepest .limit joins as the direction's own
    // per-hop rank filter
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.continue().next().reverse().look_back(14_hours)"))
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.continue().next().reverse().look_back(20_hours).limit(2)"))
    mixed3("product_price >= n", init = "n = 80", inc = "n -= 7",
      deepStep = Some("each_row.continue().next().reverse().look_back(16_hours).limit(1)"))
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.from(1).look_back(20_hours)"))
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.from(1).look_back(20_hours).limit(2)"))
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.from(0).within(16_hours, stamp).limit(1)"))
    // declines stay: contra over an UNFRAMED restart deepest (the
    // bracket is unbounded — no cap for the interval collect)
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.from(1)"), expectTierA = false)
    mixed3("get_hour(stamp) < n",
      deepStep = Some("each_row.from(1).limit(2)"), expectTierA = false)
    mixed3("n >= get_hour(stamp)", inc = "n += 2",
      deepMods = ".look_ahead(9_hours)")
    mixed3("int(product_price) >= n", init = "n = 80", inc = "n -= 7",
      deepMods = ".look_ahead(24_hours)")
    // ...and contra + aligned conjuncts together (a two-sided per-hop
    // interval: the union machinery folds both endpoints)
    mixed3("get_hour(stamp) < n && n <= get_hour(stamp) + 6",
      deepMods = ".look_ahead(18_hours)")
    // DOUBLE row sides — COMPILE since round 14: the inclusive bound
    // solves exactly through floor/ceil (v < R ⟺ v ≤ ceil(R)−1 …), and
    // the magnitude gate keeps compared values inside the exact
    // long↔double range (the interpreter converts the accumulator to
    // double the same way)
    mixed3("product_price > n")
    mixed3("n < product_price", inc = "n += 2")
    mixed3("product_price >= n", init = "n = 9")
    mixed3("n > product_price", init = "n = 90", inc = "n -= 4")
    mixed3("product_price.is(> n)")
    mixed3("product_price.is(>= n)", inc = "n += 3")
    // double + SUFFIX direction rides the merged-interval union
    mixed3("product_price <= n", deepMods = ".look_ahead(18_hours)")
    // exact-integer boundary world: prices sit ON and BESIDE integer
    // accumulator values, exercising the R == ⌈R⌉ branch both ways
    locally {
      val wb = (0 until 40).map { i =>
        (s"b${i % 2}", Mon + i * H,
          Seq("signup", "view", "purchase")(i % 3),
          "rod", Seq(1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5)(i % 8))
      }.toDF("id", "stamp", "event", "product_name", "product_price")
        .cache()
      for (g <- Seq("product_price > n", "product_price >= n",
                    "n < product_price", "n <= product_price"))
        diffOn(wb,
          s"""${sel}n = 0
             |each_row where event.is(== 'signup')
             |  n += 1
             |  each_row.continue().next() where event.is(== 'view')
             |    if $g
             |      each_row.continue().next() where event.is(== 'purchase')
             |        << n, event
             |      end
             |    end
             |  end
             |end
             |""".stripMargin)
    }
    // pinned DECLINES — each still differentially checked through Tier B:
    // UNFRAMED suffix form (round-15 adjudication, VERDICT r14 #3:
    // INHERENT under this architecture — the per-row interval collect
    // ranges over an unbounded hop window, and the per-hop endpoints
    // lo(y)/hi(y) are data-dependent with no monotone structure to fold,
    // exactly the unframed reverse-limit decline's shape; framed
    // variants compile above)
    mixed3("get_hour(stamp) < n", expectTierA = false)
    // round-15 adjudication (VERDICT r14 #3): CONTRA forms at
    // NON-DEEPEST levels decline — with the gap EXHIBITED below. At a
    // contra level each hop y contributes an ordinal INTERVAL
    // [lo(y), hi(y)] whose mismatched endpoint varies per hop, so the
    // union over hops can GAP; the state that composes reach through
    // FURTHER ladder levels is one scalar per row ("reach = a prefix of
    // size K"), and ANY scalar over-approximates a gapped union by its
    // hull. Exact composition needs interval-array state per row at
    // every level between the contra level and the deepest (state ×
    // frame-density per level, then flattened per deepest row —
    // quadratic in frame density for ONE extra level), while the
    // interpreter prices the same shape at O(visits) with no
    // materialized history. Declined, not approximated; framed and
    // unframed middles both.
    for (mods <- Seq("", ".look_ahead(12_hours)"))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next()$mods where event.is(== 'view')
           |    if get_hour(stamp) < n
           |      each_row.continue().next() where event.is(== 'click')
           |        each_row.continue().next() where event.is(== 'purchase')
           |          << n, event
           |        end
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA = false)
    // the GAP, concretely: two-sided contra intervals at the middle of a
    // depth-4 chain. Views at hours 2 and 12 admit spawn ordinals
    // [3, 8] and [13, 18] — the union gaps at {9..12}, which the hull
    // [3, 18] (any scalar ladder state) would wrongly include. Pinned on
    // the interpreter's exact output.
    locally {
      val day = Mon // 00:00 UTC Monday
      val rows =
        (1 to 20).map(j => ("z", day + j * 60000L, "signup")) ++ Seq(
          ("z", day + 24 * H + 2 * H, "view"),   // hour 2, next day
          ("z", day + 24 * H + 12 * H, "view"),  // hour 12
          ("z", day + 24 * H + 13 * H, "click"),
          ("z", day + 24 * H + 14 * H, "purchase"))
      val wg = rows.toDF("id", "stamp", "event").cache()
      val out = OslEngine.query(wg,
        s"""select
           |  count id as customers
           |end
           |n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    if get_hour(stamp) < n && n <= get_hour(stamp) + 6
           |      each_row.continue().next() where event.is(== 'click')
           |        each_row.continue().next() where event.is(== 'purchase')
           |          << n
           |        end
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, now = Mon + 400 * H)
      val got = out.where(org.apache.spark.sql.functions.col("depth") === 1)
        .select("g1").collect()
        .map(_.getString(0).toDouble.toInt).toSet
      val want = ((3 to 8) ++ (13 to 18)).toSet
      assert(got == want,
        s"union must gap at {9..12} (hull would include them): got $got")
    }
    // a magnitude past the exact long↔double range declines (the
    // interpreter's compare would round; decline rather than mimic)
    mixed3("product_price > n", inc = "n += 3000000", expectTierA = false)
    // round 15 (ADVICE): SATURATING row sides — doubles at/beyond ±2^63
    // (±Infinity, NaN, ±1e300, ±2^63 itself) and longs at
    // Long.Min/MaxValue. Spark's ceil/floor SATURATE there, so the
    // solved bounds' ±1 adjusts would WRAP ("no ordinal passes" flips
    // to "every ordinal passes"); the bounds now clamp to ±2^62 (exact
    // under the magnitude gate — every reachable accumulator value is
    // inside ±2^53) and resolve out-of-range doubles as constant
    // compares. Sizes 13 and 10 are coprime to the 3-event cycle so
    // view rows see EVERY extreme.
    locally {
      val prices = Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 1e300, -1e300, 9.3e18, -9.3e18,
        9.223372036854776e18, -9.223372036854776e18, 2.5, 17.0, -3.5, 0.0)
      val qtys = Seq(Long.MinValue, Long.MaxValue, Long.MinValue + 1,
        Long.MaxValue - 1, 1L << 62, -(1L << 62), 0L, 5L, -7L, 23L)
      val wx = (0 until 80).map { i =>
        (s"x${i % 2}", Mon + i * H,
          Seq("signup", "view", "purchase")(i % 3),
          prices(i % prices.size), qtys(i % qtys.size))
      }.toDF("id", "stamp", "event", "product_price", "qty").cache()
      // no `sum product_price` here: ±1e300/±Inf are outside the
      // engine's fixed-point ×10,000 value domain (AggFns.dsum) — the
      // extremes under test are GUARD row sides, not aggregated values
      val selX = "select\n  count id as customers\n  count event as n_rows\nend\n"
      def x3(guard: String, init: String = "n = 0", inc: String = "n += 1",
             deepMods: String = "", expectTierA: Boolean = true): Unit =
        diffOn(wx,
          s"""$selX$init
             |each_row where event.is(== 'signup')
             |  $inc
             |  each_row.continue().next() where event.is(== 'view')
             |    if $guard
             |      each_row.continue().next()$deepMods where event.is(== 'purchase')
             |        << n, event
             |      end
             |    end
             |  end
             |end
             |""".stripMargin, expectTierA)
      // double sides: aligned forms, both slopes, all four ops
      x3("product_price > n")
      x3("n < product_price", inc = "n += 2")
      x3("product_price >= n", init = "n = 9")
      x3("n > product_price", init = "n = 50", inc = "n -= 4")
      // ...and the contra (suffix) form through the interval union
      x3("product_price <= n", deepMods = ".look_ahead(18_hours)")
      // LONG sides at Long.Min/MaxValue: the same wrap existed for
      // integral row sides (MinValue − 1, and −MinValue under a
      // negative slope's operand negation)
      x3("qty > n")
      x3("n < qty", inc = "n += 2")
      x3("n > qty", init = "n = 50", inc = "n -= 2")
      x3("qty <= n", deepMods = ".look_ahead(18_hours)")
      // the round-15 gate widening: INTEGRAL sides now require the same
      // |init| ≤ 2^51, |slope| ≤ 2^21 magnitude gate (the clamp is only
      // exact under it) — wilder literals decline to Tier B
      x3("qty > n", inc = "n += 3000000", expectTierA = false)
      x3("qty > n", init = "n = 9007199254740992", expectTierA = false)
    }
    // round 14: a mixed-guarded deepest may be LIMITED when the limit is
    // exact per hop — framed forward (the hop collect carries
    // (count, mixed-folded K) pairs), framed reverse, unframed restart
    mixed3("get_hour(stamp) > n", deepMods = ".look_ahead(12_hours).limit(1)")
    mixed3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 2",
      deepMods = ".look_ahead(24_hours).limit(2)")
    mixed3("product_price > n", deepMods = ".look_ahead(18_hours).limit(2)")
    mixed3("get_hour(stamp) > n",
      deepStep = Some("each_row.continue().next().reverse().look_back(20_hours).limit(1)"))
    mixed3("get_hour(stamp) > n", deepStep = Some("each_row.from(1).limit(2)"))
    // round 15: CONTRA forms compose with FRAMED deepest limits — the
    // union's interval collect gains the per-hop rank filter
    mixed3("get_hour(stamp) < n", deepMods = ".look_ahead(12_hours).limit(1)")
    mixed3("n > get_hour(stamp)", deepMods = ".look_ahead(24_hours).limit(2)")
    mixed3("get_hour(stamp) < n && n <= get_hour(stamp) + 6",
      deepMods = ".look_ahead(18_hours).limit(1)")
    mixed3("product_price <= n", deepMods = ".look_ahead(18_hours).limit(2)")
    // declines: UNFRAMED forward limit under a deepest mixed guard (no
    // bound for the hop collect) — aligned or contra
    mixed3("get_hour(stamp) > n", expectTierA = false, deepMods = ".limit(1)")
    mixed3("get_hour(stamp) < n", expectTierA = false, deepMods = ".limit(1)")
    // (mixed-deepest + limit combinations live at the end of this test:
    // framed forms compile per-hop since round 14, unframed declines)
    // REVERSE tops (round 14): reachability in backward-ordinal space is
    // a SUFFIX (i >= T−K+1), so exactly the guard classes a forward top
    // declines — upward-closed satisfied sets (increasing acc with a
    // lower-bounding op, decreasing acc with an upper-bounding one) —
    // compose: per-hop valid sets are common-upper suffixes whose union
    // is contiguous, folded as least(K, T − lo + 1) on the same ladder.
    def mixedRev3(guard: String, expectTierA: Boolean = true,
                  init: String = "n = 0", inc: String = "n += 1",
                  deepStep: Option[String] = None): Unit =
      diffOn(worldDense,
        s"""$sel$init
           |each_row.reverse() where event.is(== 'signup')
           |  $inc
           |  each_row.continue().next() where event.is(== 'view')
           |    if $guard
           |      ${deepStep.getOrElse("each_row.continue().next()")} where event.is(== 'purchase')
           |        << n, event
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    mixedRev3("n > get_hour(stamp)")
    mixedRev3("n >= get_hour(stamp)", inc = "n += 3")
    mixedRev3("get_hour(stamp) < n") // flipped operand order, same bound
    mixedRev3("n < get_hour(stamp)", init = "n = 50", inc = "n -= 2")
    mixedRev3("n + 1 > get_hour(stamp)") // affine side composes
    // non-forward deepest under a reverse-top mixed guard
    mixedRev3("n > get_hour(stamp)",
      deepStep = Some("each_row.continue().next().reverse().look_back(24_hours)"))
    mixedRev3("n > get_hour(stamp)",
      deepStep = Some("each_row.from(1).look_back(24_hours)"))
    // round 14: CONTRA (prefix-form) guards under a reverse top compile
    // with a FRAMED forward deepest via the same merged-interval union
    mixedRev3("get_hour(stamp) > n",
      deepStep = Some("each_row.continue().next().look_ahead(12_hours)"))
    mixedRev3("n <= get_hour(stamp)",
      deepStep = Some("each_row.continue().next().look_ahead(20_hours)"))
    // pinned DECLINES: UNFRAMED prefix-form guards under a reverse top
    // (per-hop valid sets get hop-dependent LOWER ends — unions gap and
    // the union collect would be unbounded)
    mixedRev3("get_hour(stamp) > n", expectTierA = false)
    mixedRev3("n <= get_hour(stamp)", expectTierA = false)
    mixedRev3("n >= get_hour(stamp)", init = "n = 50", inc = "n -= 2",
      expectTierA = false)
    // depth-4 contra union: suffix form at the deepest of a 4-level
    // chain, framed — the hop window is the level-2 (click) matches
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'click')
         |      if get_hour(stamp) < n
         |        each_row.continue().next().look_ahead(30_hours) where event.is(== 'purchase')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("FRAMED forward middle limits above non-monotone levels (round 15)") {
    // depth-5 shapes: level 2 framed / flipped / restart (its window
    // isn't row-monotone), level 3 a framed forward LIMITED middle. The
    // round-14 G-conjunct's dominance argument fails there — the limit
    // now prices exactly per hop (the deepest fwdLimCollect machinery at
    // the level), bounded by the frame's row density. Unframed forms
    // above non-monotone levels stay pinned declines (unbounded collect).
    // the level BELOW the limited middle must itself be a MIDDLE (index
    // ≥ 2 — level 1's frame anchors at the spawn and stays collect-path
    // plain), so the shape is depth 6: plain step 1, non-monotone step
    // 2, limited framed step 3, plain deepest
    def d5(mid2: String, mid3: String,
           expectTierA: Boolean = true): Unit = {
      val step2 =
        if (mid2.startsWith("each_row.from")) mid2
        else s"each_row.continue().next()$mid2"
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.continue().next() where event.is(== 'view')
           |    $step2 where event.is(== 'click')
           |      each_row.continue().next()$mid3 where event.is(== 'purchase')
           |        each_row.continue().next() where event.is(!= 'error')
           |          << n, event
           |        end
           |      end
           |    end
           |  end
           |end
           |""".stripMargin, expectTierA)
    }
    d5(".look_ahead(40_hours)", ".look_ahead(30_hours).limit(1)")
    d5(".look_ahead(50_hours)", ".look_ahead(40_hours).limit(2)")
    d5(".reverse().look_back(40_hours)", ".look_ahead(30_hours).limit(1)")
    d5("each_row.from(1)", ".look_ahead(30_hours).limit(1)")
    // UNFRAMED forward middle limit above a non-monotone level: no bound
    // for the per-hop collect — pinned decline
    d5(".look_ahead(40_hours)", ".limit(1)", expectTierA = false)
    // monotone below: the round-14 G-conjunct path, untouched
    d5("", ".look_ahead(30_hours).limit(1)")
  }

  test("FRAMED .from(k) restart limits price per hop (round 15)") {
    // Every hop rescans from the same absolute floor, but its FRAME cuts
    // a different prefix of the floored tail — so unlike the round-14
    // unframed form there is no row-level rank cap. The rank of row r in
    // hop y's scan is exact arithmetic though: C'(r) − G(y), with C' the
    // running floored-match count and G(y) the floored matches strictly
    // below y's frame (a range-window count at the hop).
    // Depth 2, accumulator top: the spawn tuple carries G(y) and spawnOk
    // prices the rank per tuple.
    for (mods <- Seq(".look_back(24_hours).limit(1)",
                     ".look_back(30_hours).limit(2)",
                     ".look_ahead(18_hours).limit(1)",
                     ".within(15_hours, stamp).limit(2)"))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.from(1)$mods where event.is(== 'view')
           |    << n, event
           |  end
           |end
           |""".stripMargin)
    // nonzero floors move G and C' together; guarded spawns and fp
    // accumulators ride the same tuples
    diffOn(worldDense,
      s"""${sel}spend = 0
         |each_row where event.is(!= 'error')
         |  spend += product_price
         |  if product_price.is(> 10)
         |    each_row.from(4).look_back(30_hours).limit(2) where event.is(== 'view')
         |      << bucket(spend, 80), event
         |    end
         |  end
         |end
         |""".stripMargin)
    // reverse top: the backward fold only changes the accumulator mapping
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'signup')
         |  n += 1
         |  each_row.from(2).look_ahead(20_hours).limit(1) where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // PLAIN chains (no accumulators) ride the witness path: ONE max-G
    // window (the best spawn maximizes G) instead of a collect
    val sel2 = "select\n  count id as customers\n  count event as n_rows\nend\n"
    for (mods <- Seq(".look_back(24_hours).limit(1)",
                     ".look_ahead(16_hours).limit(2)",
                     ".within(12_hours, stamp).limit(1)"))
      diffOn(worldDense,
        s"""$sel2
           |each_row where event.is(== 'signup')
           |  each_row.from(1)$mods where event.is(== 'view')
           |    << event
           |  end
           |end
           |""".stripMargin)
    // witness path, depth 3: framed-from limit on the DEEPEST step
    diffOn(worldDense,
      s"""$sel2
         |each_row where event.is(== 'signup')
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.from(2).look_back(20_hours).limit(2) where event.is(== 'purchase')
         |      << event
         |    end
         |  end
         |end
         |""".stripMargin)
    // ...and on a MIDDLE step (the max-G witness works per level)
    diffOn(worldDense,
      s"""$sel2
         |each_row where event.is(== 'signup')
         |  each_row.from(1).look_back(24_hours).limit(2) where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << event
         |    end
         |  end
         |end
         |""".stripMargin)
    // MIXED guard over a framed-from-limited deepest: the rank filter
    // and the mixed least-fold both live per hop in the (G, K) collect
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if get_hour(stamp) > n
         |      each_row.from(1).look_back(24_hours).limit(2) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-5: framed-from-limited MIDDLE under a framed reverse deepest
    // (the per-hop branches at different levels compose)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.from(1).look_back(30_hours).limit(2) where event.is(== 'click')
         |      each_row.continue().next().reverse().look_back(20_hours) where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-3 MIDDLE framed-from limits ride the COLLECT path's interval
    // counts (level 1 can't be ordinal): under rowFreeGuard the rank
    // space IS the interval-count space, so the cap is one more
    // upper-endpoint min-term n + G(s0), with G the tuple's own
    // below-frame lower endpoint (__mlo / __cmx)
    for (mods <- Seq(".look_back(24_hours).limit(2)",
                     ".look_ahead(18_hours).limit(1)",
                     ".within(15_hours, stamp).limit(2)"))
      diffOn(worldDense,
        s"""${sel}n = 0
           |each_row where event.is(== 'signup')
           |  n += 1
           |  each_row.from(1)$mods where event.is(== 'view')
           |    each_row.continue().next() where event.is(== 'purchase')
           |      << n, event
           |    end
           |  end
           |end
           |""".stripMargin)
    // ...with a level-1 tally (spawnOk's per-tuple rank check at depth 3)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(1).look_back(24_hours).limit(1) where event.is(== 'view')
         |    << n, 'mid'
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // ...and under a non-forward DEEPEST (the endpoint terms stay modular)
    diffOn(worldDense,
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.from(1).look_ahead(20_hours).limit(2) where event.is(== 'view')
         |    each_row.continue().next().reverse().look_back(12_hours) where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // HALF-INFINITE step frames (span = Long.MaxValue) are handled
    // defensively throughout (witness G degenerates to the strict-before
    // count or 0; the ordinal ladder declines its unbounded bracket) but
    // are NOT constructible from source: the parser requires an argument
    // on each_row `.look_ahead/.look_back` (no-arg forms exist only on
    // ever/never test frames — Parser.parseEachRowMods vs :413), and no
    // literal span reaches Long.MaxValue.
  }

  test("depth-3 chains with plain inner steps compile (round 9)") {
    // the canonical signup -> view -> purchase chain reading the running
    // signup ordinal at the deepest level
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // tallies at every level of the depth-3 chain, non-unit increment
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 2
         |  << 'top', event
         |  each_row.continue().next() where event.is(== 'view')
         |    << n, 'mid'
         |    each_row.continue().next() where product_price.is(> 20)
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // guarded increment still collects per-spawn values at depth 3
    diff(
      s"""${sel}n = 0
         |each_row where stamp.is(> 0)
         |  if event.is(== 'purchase')
         |    n += 1
         |  end
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'signup')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("depth-4 and depth-5 plain chains compile (reachability ladder)") {
    // signup -> view -> purchase -> any non-error, reading the signup
    // ordinal at level 3: reachability composes via the __P running-max
    // windows (a level-j visit needs __P(j-1)(row) > c1(spawn))
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      each_row.continue().next() where event.is(!= 'error')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // tallies at MULTIPLE levels of a depth-4 chain
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 2
         |  each_row.continue().next() where event.is(== 'view')
         |    << n, 'mid1'
         |    each_row.continue().next() where product_price.is(> 20)
         |      << n, 'mid2'
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    // reverse top over a depth-3 chain: only the spawning set flips;
    // the reachability ladder is direction-independent
    diff(
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // and with a top .limit on the reverse scan
    diff(
      s"""${sel}n = 0
         |each_row.reverse().limit(2) where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth 5: the ladder extends one more window
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(!= 'error')
         |      each_row.continue().next() where event.is(== 'purchase')
         |        each_row.continue().next() where event.is(== 'view')
         |          << n, event
         |        end
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("declines stay Tier B: inner where read, non-plain depth 3") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 1
         |  each_row.continue().next() where product_price.is(> n)
         |    << 'deep', event
         |  end
         |end
         |""".stripMargin, expectTierA = false)
    // BOTH inner steps limited compiles since round 12 (the Γ-array at
    // the capped ordinal) — positive coverage in "BOTH depth-3 inner
    // steps limited compile (round 12)" above.
    // an INTERMEDIATE-step limit with a GUARDED deepest step declines:
    // the limit counts pred1 VISITS, the interval count spawning
    // (pred1 ∧ guard2) matches — different count spaces
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().limit(2) where event.is(== 'view')
         |    if product_price.is(> 20)
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin, expectTierA = false)
    // a depth-4 framed inner step declines (interval-count reachability
    // is depth-3 only; the general ladder needs plain steps)
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next().look_ahead(48_hours) where event.is(== 'view')
         |    each_row.continue().next() where event.is(!= 'error')
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin, expectTierA = false)
  }
}

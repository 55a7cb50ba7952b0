package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.osl._

/** Property-based differential testing: random declarative scripts from a
  * small grammar must produce IDENTICAL results through the Tier A compiler
  * and the Tier B interpreter. Catches semantic drift that hand-picked
  * examples miss (this class of test found the count-with and count-session
  * scope bugs). */
class TierPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val H = 3600000L

  // a deterministic little world: 6 people, 40 events
  private lazy val world = {
    val rnd = new scala.util.Random(7)
    val events = Seq("purchase", "view", "signup", "error")
    val products = Seq("rod", "reel", "net", "fly")
    (0 until 40).map { i =>
      (s"u${rnd.nextInt(6)}", Mon + rnd.nextInt(72) * H,
        events(rnd.nextInt(events.length)),
        products(rnd.nextInt(products.length)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }.toDF("id", "stamp", "event", "product_name", "product_price").cache()
  }

  private val genCmp: Gen[String] = Gen.oneOf(
    "event.is(== 'purchase')",
    "event.is(!= 'error')",
    "product_price.is(> 50)",
    "product_name.is(in ['rod', 'net'])",
    "event.ever(== 'signup')",
    "event.never(== 'error')",
    "event.look_back(24_hours).ever(== 'signup')",
    "product_price.look_ahead(12_hours).ever(> 80)")

  private val genWhere: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, genCmp)
  } yield cs.mkString(" && ")

  private val genGroup: Gen[String] = Gen.oneOf(
    "event", "product_name", "get_day_of_week(stamp)",
    "bucket(product_price, 25)", "'k'", "session")

  private val genSelect: Gen[String] = Gen.someOf(
    Seq("count event as n_rows", "sum product_price as total",
      "min product_price as mn", "max product_price as mx",
      "avg product_price as av", "count session as sessions",
      "count id with product_name as buyers_by_product",
      "var v as deduped_hits")).map(extra =>
    ("count id as customers" +: extra.toSeq).mkString("\n  "))

  // write-only accumulations (round 5): an optional `x = 0` init before the
  // loop plus a leading body accumulation — never read, so Tier A drops
  // them; `v` is the `var v` select name (exercises the dedup-key guard),
  // the others are plain unread vars
  private val genAccum: Gen[Option[(String, String)]] = Gen.option(Gen.oneOf(
    ("v = 0", "v = v + 1"),
    ("acc_total = 0", "acc_total = acc_total + product_price"),
    ("", "acc_hits += 1"),
    ("seen_rows = 0", "seen_rows = seen_rows + int(product_price > 10)")))

  // top-level frames (round 5): per-person-constant stamp bounds — the
  // doubled "" keeps most samples unframed
  private val genTopFrame: Gen[String] = Gen.oneOf(
    "", "", ".look_back(48_hours, now)",
    ".range('2024-01-01T00:00:00Z', '2024-01-03T00:00:00Z')",
    ".look_ahead(36_hours)", ".within(24_hours, first_stamp)")

  private val genScript: Gen[String] = for {
    sel <- genSelect
    where <- genWhere
    tf <- genTopFrame
    g1 <- genGroup
    g2 <- Gen.option(genGroup)
    cond <- Gen.option(genCmp.suchThat(!_.contains("ever") pipe identity))
    accum <- genAccum
  } yield {
    val groups = (Seq(g1) ++ g2.toSeq).mkString(", ")
    val acc = accum.map { case (_, a) => s"  $a\n" }.getOrElse("")
    val init = accum.collect { case (i, _) if i.nonEmpty => s"$i\n" }.getOrElse("")
    val body = cond match {
      case Some(c) if !c.contains("ever") && !c.contains("never") =>
        s"$acc  << $groups\n  if $c\n    << 'extra', $groups\n  end"
      case _ => s"$acc  << $groups"
    }
    s"select\n  $sel\nend\n${init}each_row$tf where $where\n$body\nend\n"
  }

  implicit class PipeOps[A](a: A) { def pipe[B](f: A => B): B = f(a) }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Vector[String]] = {
    val cols = df.columns
    df.collect().map(r => cols.indices.map(i =>
      Option(r.get(i)).map {
        case d: Double => (math.round(d * 10000) / 10000.0).toString
        case o => o.toString
      }.orNull).toVector).toSet
  }

  test("random declarative scripts: Tier A == Tier B (25 seeded samples)") {
    val params = Gen.Parameters.default
    (1 to 25).foreach { i =>
      val script = genScript.pureApply(params, Seed(i.toLong * 7919))
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // constant folding (round 11): spans/limits/from offsets/frame anchors
  // built from `+ - *` over int literals, whole doubles and `now` fold to
  // the value the interpreter would compute cursor-invalid — previously
  // any arithmetic sent the whole script to Tier B
  test("constant-folded spans/limits/anchors compile (round 11)") {
    def diff(script: String, expectTierA: Boolean = true): Unit = {
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined == expectTierA,
        s"Tier A compile expected=$expectTierA:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch:\n$script\nA=$a\nB=$b")
    }
    val sel = "select\n  count id as customers\n  count event as n_rows\nend\n"
    // arithmetic span on a top-level frame, explicit now anchor
    diff(s"""${sel}each_row.look_back(24_hours + 12_hours, now) where event.is(== 'purchase')
            |  << event
            |end
            |""".stripMargin)
    // arithmetic .limit and .from on the top loop
    diff(s"""${sel}each_row.limit(1 + 2) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin)
    diff(s"""${sel}each_row.from(2 * 1) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin)
    // arithmetic span on a chain step + arithmetic inner limit
    diff(s"""${sel}each_row where event.is(== 'signup')
            |  each_row.continue().next().look_ahead(12_hours + 6_hours).limit(3 - 1) where event.is(== 'purchase')
            |    << event
            |  end
            |end
            |""".stripMargin)
    // stamp-anchored arithmetic: first_stamp + const as a frame anchor
    diff(s"""${sel}each_row.look_ahead(24_hours, first_stamp + 12_hours) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin)
    // now-relative anchor arithmetic
    diff(s"""${sel}each_row.look_back(48_hours, now - 24_hours) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin)
    // a non-whole double INSIDE arithmetic declines: the interpreter
    // truncates the final value, a per-leaf fold would truncate earlier
    diff(s"""${sel}each_row.limit(2.5 + 0.5) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin, expectTierA = false)
    // a folded ZERO limit declines (the interpreter visits nothing; the
    // compiled limited-loop shape assumes a positive cap)
    diff(s"""${sel}each_row.limit(1 - 1) where event.is(!= 'error')
            |  << event
            |end
            |""".stripMargin, expectTierA = false)
    // row-dependent spans still decline
    diff(s"""${sel}each_row where event.is(== 'signup')
            |  each_row.continue().next().look_ahead(product_price) where event.is(== 'purchase')
            |    << event
            |  end
            |end
            |""".stripMargin, expectTierA = false)
  }

  // read accumulators (round 5): integer init + leading literal increment,
  // read in tally groups, if-guards, and is-test operands — compiled as a
  // running-count window over the visited set
  private val genReadAccum: Gen[(String, String, String)] = Gen.oneOf(
    ("n = 0", "n = n + 1", "n"),
    ("n = 10", "n = n - 2", "n"),
    ("n = 0", "n += 3", "bucket(n, 2)"),
    ("n = 1", "n = 2 + n", "n"),
    ("n = 5", "", "n")) // constant: read, never incremented

  test("read accumulators: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    val genMods = Gen.oneOf("", "", ".reverse()", ".limit(2)", ".from(1)", ".limit(3)")
    (1 to 20).foreach { i =>
      val s0 = Seed(i.toLong * 104729)
      val where = genWhere.pureApply(params, s0)
      val (init, inc, read) = genReadAccum.pureApply(params, s0.next)
      val mods = genMods.pureApply(params, s0.next.next)
      val g2 = genGroup.pureApply(params, s0.next.next.next)
      val incLine = if (inc.isEmpty) "" else s"  $inc\n"
      // round 8: the accumulator is also read inside an ever-test OPERAND —
      // the scanned-prop-aggregate compile path (personTestColumns)
      val script =
        s"""select
           |  count id as customers
           |  sum product_price as total
           |end
           |$init
           |each_row$mods where $where
           |$incLine  << $read, $g2
           |  if n <= 6
           |    << 'low', $g2
           |  end
           |  if product_price.ever(>= n * 25)
           |    << 'ever_hit', $g2
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // where-cap accumulators (round 9): a pure-accumulator conjunct in the
  // top-level where (`n < 3` — pre-increment read) extracts to a static
  // visit cap solved at compile time (TierA.capSolve), composing with
  // .limit/.reverse/.from and body reads
  test("where-cap accumulators: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    val genCap = Gen.oneOf(
      (0L, "n += 1", "n < 3"), (0L, "n += 1", "n <= 2"),
      (0L, "n += 2", "n < 5"), (0L, "n += 1", "n != 2"),
      (0L, "n += 1", "n == 0"), (5L, "n -= 1", "n > 1"),
      (5L, "n -= 2", "n >= 2"), (0L, "n += 1", "4 > n"),
      (9L, "n += 1", "n < 3"), /* init already fails: zero visits */
      // round 15: DYNAMIC caps (row-value sides / prop increments) ride
      // the GatedFold sequential gate instead of capSolve
      (0L, "n += 1", "n < product_price"),
      (0L, "n += 1", "get_hour(stamp) >= n"),
      (0L, "n += product_price", "n < 100"),
      (50L, "n -= 2", "n > product_price"))
    val genMods = Gen.oneOf("", "", ".reverse()", ".limit(2)", ".from(1)")
    val genBodyRead = Gen.oneOf("", "", "n", "bucket(n, 3)")
    (1 to 20).foreach { i =>
      val s0 = Seed(i.toLong * 15485863)
      val where = genWhere.pureApply(params, s0)
      val (init, inc, cond) = genCap.pureApply(params, s0.next)
      val mods = genMods.pureApply(params, s0.next.next)
      val read = genBodyRead.pureApply(params, s0.next.next.next)
      val g2 = genGroup.pureApply(params, s0.slide)
      val readTally = if (read.isEmpty) "" else s"  << $read, $g2\n"
      val script =
        s"""select
           |  count id as customers
           |  sum product_price as total
           |end
           |n = $init
           |each_row$mods where $where && $cond
           |  $inc
           |$readTally  << 'capped', $g2
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"where-cap sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"where-cap tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // guarded read accumulators (round 7): leading `if cond { n ± lit }`
  // (optional else branch, optional unconditional companion increment)
  // compile to conditional running-sum windows
  test("guarded read accumulators: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    val genGuard = Gen.oneOf(
      "event.is(== 'purchase')", "product_price.is(> 40)",
      "product_name.is(in ['rod', 'net'])", "event.ever(== 'signup')",
      "event.is(!= 'error') && product_price.is(> 10)")
    val genInc = Gen.oneOf("n = n + 1", "n += 2", "n = n - 1")
    val genElse = Gen.option(Gen.oneOf("n = n + 10", "n -= 1"))
    val genPre = Gen.oneOf("", "", "n = n + 1")
    val genMods = Gen.oneOf("", "", ".reverse()", ".limit(3)", ".from(1)")
    val genRead = Gen.oneOf("n", "bucket(n, 3)")
    (1 to 20).foreach { i =>
      val s0 = Seed(i.toLong * 179424673)
      val where = genWhere.pureApply(params, s0)
      val guard = genGuard.pureApply(params, s0.next)
      val inc = genInc.pureApply(params, s0.next.next)
      val els = genElse.pureApply(params, s0.next.next.next)
      val pre = genPre.pureApply(params, s0.slide)
      val mods = genMods.pureApply(params, s0.slide.next)
      val read = genRead.pureApply(params, s0.slide.next.next)
      val g2 = genGroup.pureApply(params, s0.slide.next.next.next)
      val preLine = if (pre.isEmpty) "" else s"  $pre\n"
      val elseLines = els.map(e => s"  else\n    $e\n").getOrElse("")
      val script =
        s"""select
           |  count id as customers
           |  sum product_price as total
           |end
           |n = 0
           |each_row$mods where $where
           |$preLine  if $guard
           |    $inc
           |$elseLines  end
           |  << $read, $g2
           |  if n <= 6
           |    << 'low'
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"guarded sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"guarded tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  test("value selects over conditional tallies: Tier A == Tier B (15 seeded samples)") {
    val params = Gen.Parameters.default
    val genCond = Gen.oneOf("event.is(== 'purchase')", "product_price.is(> 30)",
      "product_name.is(in ['rod', 'fly'])")
    (1 to 15).foreach { i =>
      val s0 = Seed(i.toLong * 15485863)
      val where = genWhere.pureApply(params, s0)
      val cond = genCond.pureApply(params, s0.next)
      val g = genGroup.pureApply(params, s0.next.next)
      // even samples scan backward: value's last write is then the
      // EARLIEST visited writer (rank-from-end merge key)
      val rev = if (i % 2 == 0) ".reverse()" else ""
      val script =
        s"""select
           |  value product_name as last_name
           |  value product_price as last_price
           |  count id as customers
           |end
           |each_row$rev where $where
           |  if $cond
           |    << 'v', $g
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"value sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"value tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // ------------------------------------------------------- chain scripts
  // Unique stamps per person: chain semantics depend on row ORDER, and both
  // tiers break stamp ties arbitrarily, so the differential world must be
  // collision-free (the driver's test data is too).
  private lazy val chainWorld = {
    val rnd = new scala.util.Random(11)
    val events = Seq("purchase", "view", "signup", "error")
    val products = Seq("rod", "reel", "net", "fly")
    (0 until 60).map { i =>
      (s"u${i % 6}", Mon + (i / 6) * 7 * H + (i % 6) * H,
        events(rnd.nextInt(4)), products(rnd.nextInt(4)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    }.toDF("id", "stamp", "event", "product_name", "product_price").cache()
  }

  private val genChainScript: Gen[String] = for {
    sel <- genSelect
    depth <- Gen.choose(2, 3)
    wheres <- Gen.listOfN(depth, genWhere)
    gs <- Gen.listOfN(depth, genGroup)
    tallyOuter <- Gen.oneOf(true, false)
    limitN <- Gen.option(Gen.choose(1L, 3L))
    limitLevel <- Gen.choose(0, depth - 1) // any chain level may carry it, incl. top
    guards <- Gen.listOfN(depth, Gen.option(Gen.oneOf(
      "event.is(!= 'error')", "product_price.is(> 20)",
      "event.ever(== 'signup')")))
    // contra-directional frames (.look_back on a forward step, un-mirrored
    // .look_ahead on a reverse step) compile to honest witness-stamp bounds;
    // explicit-anchor frames (round 5) fold into the level predicate
    frames <- Gen.listOfN(depth,
      Gen.oneOf("", "", ".look_ahead(10_hours)", ".within(16_hours, stamp)",
        ".look_back(14_hours)", ".look_ahead(6_hours)",
        ".look_back(60_hours, now)", ".within(30_hours, first_stamp)",
        ".range('2024-01-01T08:00:00Z', '2024-01-03T00:00:00Z')"))
    revs <- Gen.listOfN(depth, Gen.oneOf(false, false, true))
    // `.from(k)` absolute-restart steps (forward; limit only when unframed)
    fromSteps <- Gen.listOfN(depth, Gen.oneOf(false, false, true))
    froms <- Gen.listOfN(depth, Gen.choose(0L, 6L))
    fromNexts <- Gen.listOfN(depth, Gen.oneOf(true, false))
    topFrom <- Gen.option(Gen.choose(0L, 5L))
    // write-only accumulators at level heads (NOT the `var v` select name:
    // assignment to it plus a `.from` revisit step is Tier B by design)
    accums <- Gen.listOfN(depth, Gen.oneOf("", "", "acc += 1",
      "acc = acc + product_price"))
  } yield {
    // innermost-out: each level may sit under an `if` guard in its parent
    var block: Seq[String] =
      (if (accums(depth - 1).nonEmpty) Seq(accums(depth - 1)) else Nil) :+
        s"<< 'L${depth - 1}', ${gs(depth - 1)}"
    for (k <- depth - 1 to 1 by -1) {
      val head = if (fromSteps(k)) {
        val frame = frames(k) match {
          case ".look_ahead(6_hours)" => "" // keep the option space small
          case f => f
        }
        val lim = if (k == limitLevel && frame.isEmpty)
          limitN.map(n => s".limit($n)").getOrElse("") else ""
        val nxt = if (fromNexts(k)) ".next()" else ""
        s"each_row.from(${froms(k)})$nxt$frame$lim where ${wheres(k)}"
      } else {
        val lim = if (k == limitLevel) limitN.map(n => s".limit($n)").getOrElse("") else ""
        // mirror ONE look_ahead variant on reverse steps (aligned frame);
        // the 6-hour variant stays un-mirrored to exercise contra frames
        val frame = if (revs(k) && frames(k) == ".look_ahead(10_hours)")
          ".look_back(10_hours)" else frames(k)
        val rev = if (revs(k)) ".reverse()" else ""
        s"each_row.continue().next()$rev$frame$lim where ${wheres(k)}"
      }
      var inner = Seq(head) ++ block.map("  " + _) ++ Seq("end")
      guards(k).foreach { g =>
        inner = Seq(s"if $g") ++ inner.map("  " + _) ++ Seq("end")
      }
      val tallyHere = if (tallyOuter) Seq(s"<< 'L${k - 1}', ${gs(k - 1)}") else Nil
      val accHere = if (accums(k - 1).nonEmpty) Seq(accums(k - 1)) else Nil
      block = accHere ++ tallyHere ++ inner
    }
    val topRev = if (revs(0)) ".reverse()" else ""
    val topFromS = topFrom.map(j => s".from($j)").getOrElse("")
    val topLim = if (limitLevel == 0) limitN.map(n => s".limit($n)").getOrElse("") else ""
    // a framed TOP gates which rows spawn the chain (round 5); reuse the
    // topFrom coin so most samples stay unframed
    val topTF = if (topFrom.isEmpty && fromNexts(0)) ".look_back(80_hours, now)" else ""
    s"select\n  $sel\nend\neach_row$topFromS$topRev$topTF$topLim where ${wheres(0)}\n" +
      block.map("  " + _).mkString("\n") + "\nend\n"
  }

  // ------------------------------------------- segment + histogram scripts
  private val genPersonPred: Gen[String] = {
    val leaf = Gen.oneOf(
      "event.ever(== 'purchase')", "event.never(== 'error')",
      "product_name.ever(in ['rod', 'net'])",
      "event.look_back(48_hours).ever(== 'signup')",
      // .next() at top level: cursor invalid -> same as plain ever
      "event.next().ever(== 'view')",
      // person-dependent anchors (first/last_stamp person aggregates)
      "event.look_back(36_hours, last_stamp).ever(== 'purchase')",
      "event.within(24_hours, first_stamp).ever(== 'signup')",
      "product_name.look_ahead(48_hours, first_stamp).never(== 'fly')",
      "event.look_ahead(2_hours, last_stamp).ever(== 'view')",
      "(sum(product_price) where event.is(== 'purchase')) > 150",
      "(count(event) where product_price.is(> 40)) >= 2",
      "(dcount(product_name) where event.is(== 'view')) > 1")
    for {
      n <- Gen.choose(1, 3)
      ls <- Gen.listOfN(n, leaf)
      op <- Gen.oneOf(" && ", " || ")
    } yield ls.mkString(op)
  }

  test("random declarative segments: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    (1 to 20).foreach { i =>
      val preds = (0 until 2).map(j =>
        genPersonPred.pureApply(params, Seed(i.toLong * 31337 + j)))
      val script = preds.zipWithIndex.map { case (p, j) =>
        s"@segment s$j\nif $p\n  return(true)\nend\n"
      }.mkString
      val defs = Parser.segments(script)
      assert(TierA.compileSegments(defs, world, Mon + 100 * H).isDefined,
        s"segment sample $i did not compile:\n$script")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val a = canon(OslEngine.segments(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.segments(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"segment tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  private val genFunnelSegScript: Gen[String] = for {
    w0 <- genWhere
    w1 <- genWhere
    guard <- Gen.option(Gen.oneOf("product_price.is(> 20)", "event.is(!= 'error')"))
    retGuard <- Gen.option(Gen.oneOf("product_price.is(> 40)", "event.ever(== 'signup')"))
    lim <- Gen.option(Gen.choose(1L, 2L))
    frame <- Gen.oneOf("", ".look_ahead(24_hours)", ".within(30_hours, stamp)")
  } yield {
    val limS = lim.map(n => s".limit($n)").getOrElse("")
    val retBlock = retGuard match {
      case Some(g) => Seq(s"  if $g", "    return(true)", "  end")
      case None => Seq("  return(true)")
    }
    val inner = Seq(s"each_row.continue().next()$frame$limS where $w1") ++
      retBlock ++ Seq("end")
    val innerG = guard match {
      case Some(g) => Seq(s"if $g") ++ inner.map("  " + _) ++ Seq("end")
      case None => inner
    }
    s"@segment f\neach_row where $w0\n" +
      innerG.map("  " + _).mkString("\n") + "\nend\n"
  }

  test("random funnel segments: Tier A window-exists == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    (1 to 20).foreach { i =>
      val script = genFunnelSegScript.pureApply(params, Seed(i.toLong * 49157))
      val defs = Parser.segments(script)
      assert(defs.forall(d => TierA.segmentChainCompilable(d, Mon + 100 * H)),
        s"funnel segment sample $i did not probe compilable:\n$script")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val a = canon(OslEngine.segments(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.segments(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"funnel segment mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  private val genHistScript: Gen[String] = {
    val agg = Gen.oneOf(
      "sum(product_price) where event.is(== 'purchase')",
      "count(event) where product_name.is(in ['rod', 'fly'])",
      "dcount(product_name) where event.is(!= 'error')",
      "max(product_price) where event.is(== 'view')",
      "avg(product_price) where product_price.is(> 20)",
      "test(event) where product_price.is(> 90)")
    for {
      a1 <- agg; a2 <- agg
      ret <- Gen.oneOf("return(bucket(x + y, 10))", "return(x * 100 + y)",
        "return(x - y)", "return(bucket(x, 25) + y)")
    } yield s"x = $a1\ny = $a2\n$ret\n"
  }

  test("random histogram scripts: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    (1 to 20).foreach { i =>
      val script = genHistScript.pureApply(params, Seed(i.toLong * 65537))
      val p = Parser.program(script)
      assert(TierA.compileHistogram(p, world, Mon + 100 * H).isDefined,
        s"histogram sample $i did not compile:\n$script")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0),
          math.round(r.getDouble(1) * 10000) / 10000.0)).toSet
      val a = canon(OslEngine.histogram(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.histogram(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"histogram tier mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // robustness: arbitrary junk must produce a clean parse error (or parse),
  // never a hang, stack overflow, or unclassified crash — the guarantee an
  // API server fielding user scripts needs from the front-end
  test("parser total on random junk and truncated scripts (100 samples)") {
    val rnd = new scala.util.Random(23)
    val atoms = Seq("each_row", "select", "end", "if", "else", "<<", "(", ")",
      "&&", "||", "==", "'x'", "1.5", "now", "__", "@segment", ".limit(",
      "\n", "  ", "event", ".is(", "return(", "{", "}", "[", "]", ",", "+")
    val valid = genScript.pureApply(Gen.Parameters.default, Seed(99L))
    (1 to 100).foreach { i =>
      val s =
        if (i % 3 == 0) valid.take(rnd.nextInt(valid.length)) // truncations
        else (0 until rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString(" ")
      try { Parser.program(s); () }
      catch {
        case _: IllegalArgumentException => () // the classified parse error
        case e: Throwable => fail(s"unclassified ${e.getClass} on sample $i:\n$s")
      }
    }
  }

  // non-literal accumulators (round 8): a running PROP sum (`spend = spend
  // + product_price`) — one increment statement, init 0, forward scan —
  // compiles to a double running-sum window whose add sequence is exactly
  // the interpreter's (bit-identical keys)
  test("non-literal prop accumulators: Tier A == Tier B (15 seeded samples)") {
    val params = Gen.Parameters.default
    val genInc = Gen.oneOf(
      "spend = spend + product_price", "spend += product_price",
      "spend = spend - product_price", "spend -= product_price")
    val genGuard = Gen.option(Gen.oneOf(
      "event.is(== 'purchase')", "product_price.is(> 30)"))
    val genRead = Gen.oneOf("bucket(spend, 100)", "spend > 120", "bucket(spend, 40)")
    // reverse tops compile since round 10 (stamp-DESC running frame =
    // the interpreter's backward fold order, fp-exact)
    val genMods = Gen.oneOf("", "", ".limit(4)", ".from(1)",
      ".reverse()", ".reverse().limit(3)")
    (1 to 15).foreach { i =>
      val s0 = Seed(i.toLong * 2750159)
      val where = genWhere.pureApply(params, s0)
      val inc = genInc.pureApply(params, s0.next)
      val guard = genGuard.pureApply(params, s0.next.next)
      val read = genRead.pureApply(params, s0.next.next.next)
      val mods = genMods.pureApply(params, s0.slide)
      val g2 = genGroup.pureApply(params, s0.slide.next)
      val incBlock = guard match {
        case Some(g) => s"  if $g\n    $inc\n  end\n"
        case None    => s"  $inc\n"
      }
      val script =
        s"""select
           |  count id as customers
           |  count event as n_rows
           |end
           |spend = 0
           |each_row$mods where $where
           |$incBlock  << $read, $g2
           |  if spend <= 150
           |    << 'small', $g2
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"prop-accum sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"prop-accum mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
    // pinned reverse tops (round 10): backward fold, fp-exact; alone,
    // with a limit (visits = LAST n matches, accumulated from the end),
    // and with a guard
    for (mods <- Seq(".reverse()", ".reverse().limit(3)")) {
      val script =
        s"""select
           |  count id as customers
           |  count event as n_rows
           |end
           |spend = 0
           |each_row$mods where event.is(!= 'error')
           |  if product_price.is(> 25)
           |    spend += product_price
           |  end
           |  << bucket(spend, 60), event
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"reverse prop-accum did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"reverse prop-accum mismatch:\n$script\nA=$a\nB=$b")
    }
    // reverse CHAIN top (round 11): the chain-witness accumulator now runs
    // over a __rn-DESC running frame — fp-exact backward fold, spawns
    // carry the backward running value into the below-chain read
    locally {
      val script = "select\n  count id as customers\nend\n" +
        "spend = 0\neach_row.reverse() where event.is(!= 'x')\n  spend += product_price\n  each_row.continue().next() where event.is(== 'view')\n    << bucket(spend, 50), event\n  end\nend\n"
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"reverse chain-top prop-accum did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"reverse chain-top prop-accum mismatch:\n$script\nA=$a\nB=$b")
    }
    // round 13: nonzero inits and multi-statement fp bodies COMPILE now
    // (FoldSum replays the interpreter's statement-ordered add sequence)
    for (good <- Seq(
      "spend = 5\neach_row where event.is(!= 'x')\n  spend += product_price\n  << bucket(spend, 50)\nend\n",
      "spend = 0\neach_row where event.is(!= 'x')\n  spend += product_price\n  spend += 1\n  << bucket(spend, 50)\nend\n")) {
      val script = s"select\n  count id as customers\nend\n$good"
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isDefined,
        s"expected Tier A (round-13 FoldSum) for:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"FoldSum shape mismatch:\n$script")
    }
    // declines: string prop (concatenation, not arithmetic)
    for (bad <- Seq(
      "spend = 0\neach_row where event.is(!= 'x')\n  spend += product_name\n  << bucket(spend, 50)\nend\n")) {
      val script = s"select\n  count id as customers\nend\n$bad"
      val p = Parser.program(script)
      assert(TierA.compile(p, world, Mon + 100 * H, 1800000L).isEmpty,
        s"expected Tier B decline for:\n$script")
      val a = canon(OslEngine.query(world, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(world, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b)
    }
  }

  // chain accumulators (round 8): increment leads the TOP body, reads sit
  // below the chain step and observe the SPAWNING visit's value — compiled
  // as per-spawn entry enumeration (one tally per distinct spawn value)
  test("chain accumulators: Tier A == Tier B (20 seeded samples)") {
    val params = Gen.Parameters.default
    val genInc = Gen.oneOf("n += 1", "n = n + 2", "n -= 1")
    val genGuardedInc = Gen.option(Gen.oneOf(
      "if event.is(== 'purchase')\n    n += 3\n  end",
      "if product_price.is(> 40)\n    n = n + 1\n  end"))
    val genRead = Gen.oneOf("n", "bucket(n, 2)", "n + 10")
    val genTopMods = Gen.oneOf("", "", ".limit(3)", ".reverse()")
    val genChainGuard = Gen.option(Gen.oneOf(
      "event.is(!= 'error')", "product_price.is(> 20)"))
    val genTopTally = Gen.oneOf(true, false)
    // inner frames/limits compose (late round 8): per-spawn eligibility
    // (cursor frames), absolute bounds fold into the level predicate
    val genInnerMods = Gen.oneOf("", "", ".limit(1)", ".limit(2)",
      ".look_ahead(15_hours)", ".look_ahead(20_hours).limit(2)",
      ".within(16_hours, stamp)",
      ".range('2024-01-01T08:00:00Z', '2024-01-03T00:00:00Z')",
      // round 11: reverse inner steps (FOLLOWING collect, mirrored checks)
      ".reverse()", ".reverse().look_back(20_hours)", ".reverse().limit(2)",
      ".reverse().look_back(30_hours).limit(1)")
    // round 11: `.from(k)` restart steps (two-sided inverted-frame
    // collect; limits compose only unframed — upstream gate)
    val genInnerForm = Gen.oneOf(
      "each_row.continue().next()", "each_row.continue().next()",
      "each_row.continue().next()",
      "each_row.from(0)", "each_row.from(2)")
    val genFromMods = Gen.oneOf("", ".limit(2)", ".look_back(18_hours)",
      ".look_ahead(14_hours)", ".within(12_hours, stamp)")
    (1 to 20).foreach { i =>
      val s0 = Seed(i.toLong * 7368787)
      val w0 = genWhere.pureApply(params, s0)
      val w1 = genWhere.pureApply(params, s0.next)
      val inc = genInc.pureApply(params, s0.next.next)
      val ginc = genGuardedInc.pureApply(params, s0.next.next.next)
      val read = genRead.pureApply(params, s0.slide)
      val mods = genTopMods.pureApply(params, s0.slide.next)
      val cg = genChainGuard.pureApply(params, s0.slide.next.next)
      val g2 = genGroup.pureApply(params, s0.slide.next.next.next)
      val topTally = genTopTally.pureApply(params, s0.slide.slide)
      val innerForm = genInnerForm.pureApply(params, s0.slide.slide.next.next)
      val innerMods =
        if (innerForm.contains(".from("))
          genFromMods.pureApply(params, s0.slide.slide.next)
        else genInnerMods.pureApply(params, s0.slide.slide.next)
      val gincLine = ginc.map(g => s"  $g\n").getOrElse("")
      val topTallyLine = if (topTally) s"  << 'top', $read\n" else ""
      val inner =
        s"""$innerForm$innerMods where $w1
           |    << $read, $g2
           |    if n <= 4
           |      << 'low_spawn'
           |    end
           |  end""".stripMargin
      val innerG = cg match {
        case Some(g) =>
          s"""if $g
             |    ${inner.linesIterator.mkString("\n  ")}
             |  end""".stripMargin
        case None => inner
      }
      val script =
        s"""select
           |  count id as customers
           |  count event as n_rows
           |  sum product_price as total
           |end
           |n = 0
           |each_row$mods where $w0
           |  $inc
           |$gincLine$topTallyLine  $innerG
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, chainWorld, Mon + 100 * H, 1800000L).isDefined,
        s"chain-accum sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"chain-accum mismatch on sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // ever-reads below a chain step (round 9): the test's operand observes
  // the SPAWN's accumulator value — compiled compare re-derived per
  // collected spawn tuple (realB late binding)
  test("chain ever-reads: Tier A == Tier B (10 seeded samples)") {
    val params = Gen.Parameters.default
    val genInc = Gen.oneOf("n += 1", "n = n + 2", "n -= 1")
    val genEver = Gen.oneOf(
      "product_price.ever(> n * 10)", "product_price.never(< n)",
      "product_price.ever(>= n + 20)", "product_price.look_back(20_hours).ever(> n)",
      "product_price.ever(<= n * 30)", "product_price.ever(!= n)")
    val genTopMods = Gen.oneOf("", "", ".limit(3)", ".reverse()")
    (1 to 10).foreach { i =>
      val s0 = Seed(i.toLong * 32452843)
      val w0 = genWhere.pureApply(params, s0)
      val w1 = genWhere.pureApply(params, s0.next)
      val inc = genInc.pureApply(params, s0.next.next)
      val ev = genEver.pureApply(params, s0.next.next.next)
      val mods = genTopMods.pureApply(params, s0.slide)
      val g2 = genGroup.pureApply(params, s0.slide.next)
      val script =
        s"""select
           |  count id as customers
           |  sum product_price as total
           |end
           |n = 0
           |each_row$mods where $w0
           |  $inc
           |  each_row.continue().next() where $w1
           |    if $ev
           |      << 'hit', $g2
           |    end
           |    << n, $g2
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, chainWorld, Mon + 100 * H, 1800000L).isDefined,
        s"chain ever-read sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on chain ever-read sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // depth-3 chain accumulators (round 9): plain inner steps; a row is a
  // level-2 visit for spawn s0 iff a level-1 match lies strictly between
  // them — per-tuple match-count-difference check. Round 11 widens the
  // depth-3 samples with framed (finite look_ahead) and guarded inner
  // steps: reachability becomes the interval count between endpoint
  // prefix counts.
  test("depth-3/4 chain accumulators: Tier A == Tier B (15 seeded samples)") {
    val params = Gen.Parameters.default
    val genInc = Gen.oneOf("n += 1", "n = n + 2", "n -= 1")
    val genGuardedInc = Gen.option(Gen.oneOf(
      "if event.is(== 'purchase')\n    n += 3\n  end",
      "if product_price.is(> 40)\n    n = n + 1\n  end"))
    val genRead = Gen.oneOf("n", "bucket(n, 2)", "n + 10")
    val genTopMods = Gen.oneOf("", "", ".limit(3)", ".from(1)", ".reverse()")
    val genTopTally = Gen.oneOf(true, false)
    val genMidTally = Gen.oneOf(true, false)
    val genMidMods = Gen.oneOf("", "", ".look_ahead(15_hours)",
      ".look_ahead(40_hours)", ".limit(2)", ".look_ahead(40_hours).limit(1)")
    val genDeepMods = Gen.oneOf("", "", ".look_ahead(20_hours)",
      ".look_ahead(50_hours)", ".limit(1)", ".look_ahead(50_hours).limit(2)",
      // round 12: REVERSE deepest steps (other-side interval endpoints)
      ".reverse()", ".reverse().look_back(25_hours)",
      // round 14: framed reverse + limit (exact filtered hop max)
      ".reverse().look_back(25_hours).limit(1)")
    val genDeepGuard = Gen.option(Gen.oneOf(
      "event.is(!= 'error')", "product_price.is(> 25)",
      // round 11: spawn-pure accumulator guards + a mixed split guard
      "n <= 2", "n > 1", "n > 1 && product_price.is(> 25)",
      // round 12: MIXED accum-vs-row conjuncts (solvable upper-bounding
      // forms — the sample assembly below forces the rest of the draw
      // into ordinal-compatible shape; unsolvable/declining forms are
      // pinned in TierChainAccumSpec)
      "get_hour(stamp) > n", "n < get_hour(stamp)",
      "n <= 2 && get_hour(stamp) >= n",
      // round 13/14: affine accumulator sides and bare DOUBLE row sides
      "n + 1 < get_hour(stamp)", "product_price > n"))
    (1 to 15).foreach { i =>
      val s0 = Seed(i.toLong * 9437183)
      val w0 = genWhere.pureApply(params, s0)
      val w1 = genWhere.pureApply(params, s0.next)
      val w2 = genWhere.pureApply(params, s0.next.next)
      val inc = genInc.pureApply(params, s0.next.next.next)
      val ginc = genGuardedInc.pureApply(params, s0.slide)
      val read = genRead.pureApply(params, s0.slide.next)
      val mods = genTopMods.pureApply(params, s0.slide.next.next)
      val g2 = genGroup.pureApply(params, s0.slide.next.next.next)
      val topTally = genTopTally.pureApply(params, s0.slide.slide)
      val midTally = genMidTally.pureApply(params, s0.slide.slide.next)
      // every third sample goes one level deeper (depth 4): the
      // reachability ladder gains a running-max window per level
      val depth4 = i % 3 == 0
      val w3 = genWhere.pureApply(params, s0.slide.slide.next.next)
      // framed inner steps are depth-3 only (round 11); inner limits
      // compose on either or BOTH steps (round 12), and an
      // intermediate-step limit needs a row-prop-free deepest guard;
      // guards (row-prop folded, accum spawn-pure split) compose at any
      // depth (round 11)
      val midMods =
        if (depth4) "" else genMidMods.pureApply(params, s0.slide.slide.slide)
      val deepMods0 =
        if (depth4) ""
        else genDeepMods.pureApply(params, s0.slide.slide.slide.next)
      val deepGuard0 =
        genDeepGuard.pureApply(params, s0.slide.slide.slide.next.next)
      // round 12: a MIXED accum-vs-row draw rides the ordinal path only —
      // force the rest of the sample into ordinal-compatible shape
      // (constant positive increments, forward top, plain middle step, no
      // deepest limit); the declining combinations are pinned separately
      // in TierChainAccumSpec
      val mixedDraw = deepGuard0.exists(g =>
        g.contains("get_hour(") || g.contains("product_price > n"))
      val mods1 = if (mixedDraw && mods == ".reverse()") "" else mods
      val inc1 = if (mixedDraw && inc == "n -= 1") "n += 1" else inc
      val ginc1 = if (mixedDraw) None else ginc
      val midMods1 = if (mixedDraw) "" else midMods
      val midLim = midMods1.contains(".limit(")
      // round 12: BOTH limits compose, so a mid limit no longer strips
      // the deepest one; a mixed guard still rules out a deepest LIMIT
      // (mixed rides the ordinal path only). A reverse/restart deepest
      // IS gate-allowed under a mixed guard — pinned in
      // TierChainAccumSpec (rounds 13–14; a restart deepest is a bare
      // nested `each_row.from(k)` — `.from` is interpreter-dead under
      // `.continue()`); this generator keeps its draw
      // space ordinal-plain to avoid skewing the other dimensions
      // round 14: mixed deepest guards compose with FRAMED limits (the
      // per-hop collect) and with reverse deepests in any framing — only
      // an UNFRAMED limit still declines under mixed
      val deepMods =
        if (mixedDraw && deepMods0 == ".limit(1)") "" else deepMods0
      // under an intermediate limit only spawn-pure (no `.is(`) deepest
      // guards keep the count spaces aligned
      val deepGuard =
        if (midLim) deepGuard0.filter(g => !g.contains(".is(")) else deepGuard0
      val gincLine = ginc1.map(g => s"  $g\n").getOrElse("")
      val topTallyLine = if (topTally) s"  << 'top', $read\n" else ""
      val midTallyLine = if (midTally) s"    << $read, 'mid'\n" else ""
      // round 11: the depth-4 DEEPEST step may be framed/limited (the
      // final ladder window range-bounds; the limit is a G conjunct)
      val d4Mods0 = Gen.oneOf("", "", ".look_ahead(30_hours)", ".limit(1)",
        ".look_ahead(50_hours).limit(2)")
        .pureApply(params, s0.slide.slide.slide.slide)
      // a mixed guard at the depth-4 deepest rules out only the
      // UNFRAMED limit since round 14 (framed limits price per hop)
      val d4Mods =
        if (mixedDraw && d4Mods0 == ".limit(1)") "" else d4Mods0
      val deepest =
        if (depth4) deepGuard match {
          // round 11: depth-4 deepest-step guards compose (row-prop
          // conjuncts fold into the ladder, accum conjuncts per tuple)
          case Some(g) =>
            s"""each_row.continue().next() where $w2
               |      if $g
               |        each_row.continue().next()$d4Mods where $w3
               |          << $read, $g2
               |        end
               |      end
               |    end""".stripMargin
          case None =>
            s"""each_row.continue().next() where $w2
               |      each_row.continue().next()$d4Mods where $w3
               |        << $read, $g2
               |      end
               |    end""".stripMargin
        }
        else deepGuard match {
          case Some(g) =>
            s"""if $g
               |      each_row.continue().next()$deepMods where $w2
               |        << $read, $g2
               |      end
               |    end""".stripMargin
          case None =>
            s"""each_row.continue().next()$deepMods where $w2
               |      << $read, $g2
               |    end""".stripMargin
        }
      val script =
        s"""select
           |  count id as customers
           |  sum product_price as total
           |end
           |n = 0
           |each_row$mods1 where $w0
           |  $inc1
           |$gincLine$topTallyLine  each_row.continue().next()$midMods1 where $w1
           |$midTallyLine    $deepest
           |  end
           |end
           |""".stripMargin
      val p = Parser.program(script)
      assert(TierA.compile(p, chainWorld, Mon + 100 * H, 1800000L).isDefined,
        s"depth-3 accum sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on depth-3 accum sample $i:\n$script\nA=$a\nB=$b")
    }
  }

  // round-15 directive #4: every round-14 compile class draws in the
  // seeded differential harness (this harness caught the G-lookup
  // monotonicity hazard, the `__accs_` prefix trap and the unclamped
  // reverse-mid endpoint — classes that never draw never get that
  // protection). Grammar table — one row per class, each a constrained
  // template whose free slots (wheres, spans, limits, groups) randomize
  // per seed:
  //   mixed_rev_top        mixed guards under REVERSE tops (suffix fold)
  //   contra_union         framed-deepest suffix forms (interval union)
  //   contra_two_sided     two-sided per-hop intervals through the union
  //   double_row           bare DOUBLE row sides (floor/ceil bounds)
  //   rev_deep_limited     framed reverse deepest + .limit (per-hop max)
  //   restart_deep         genuine .from(k) deepests (framed / limited)
  //   restart_framed_lim   FRAMED .from(k) + .limit — per-hop C'−G rank
  //                        (round 15; depth 2 tuple-G / d3 deepest / d4 mid)
  //   mid_direction        framed / reverse / restart MIDDLE steps (d4)
  //   fwd_mid_limited      forward middle .limit via the G-conjunct (d4)
  //   rev_mid_limited      framed reverse middle .limit (d4)
  //   mixed_deep_limited   mixed guard on a framed limited deepest
  //   dyn_where_cap        round-15 dynamic where caps (GatedFold)
  // A round-robin over the table guarantees coverage; the counter
  // asserts every class drew ≥ 3 of the 39 samples.
  test("round-14/15 plan classes: Tier A == Tier B (39 samples, full class coverage)") {
    val params = Gen.Parameters.default
    def draw[A](g: Gen[A], s: Seed): A = g.pureApply(params, s)
    val genSpan = Gen.oneOf("15_hours", "24_hours", "40_hours")
    val genLim = Gen.oneOf(1, 2)
    val sel = "select\n  count id as customers\n  count event as n_rows\nend\n"
    def d3(top: String, init: String, inc: String, guard: Option[String],
           deep: String, s: Seed): String = {
      val w0 = draw(genWhere, s)
      val w1 = draw(genWhere, s.next)
      val w2 = draw(genWhere, s.next.next)
      val g2 = draw(genGroup, s.slide)
      val inner = guard match {
        case Some(g) =>
          s"""if $g
             |      $deep where $w2
             |        << n, $g2
             |      end
             |    end""".stripMargin
        case None =>
          s"""$deep where $w2
             |      << n, $g2
             |    end""".stripMargin
      }
      s"""${sel}n = $init
         |each_row$top where $w0
         |  $inc
         |  each_row.continue().next() where $w1
         |    $inner
         |  end
         |end
         |""".stripMargin
    }
    def d4(mid: String, deep: String, s: Seed): String = {
      val w0 = draw(genWhere, s)
      val w1 = draw(genWhere, s.next)
      val w2 = draw(genWhere, s.next.next)
      val w3 = draw(genWhere, s.slide)
      val g2 = draw(genGroup, s.slide.next)
      s"""${sel}n = 0
         |each_row where $w0
         |  n += 1
         |  each_row.continue().next() where $w1
         |    $mid where $w2
         |      $deep where $w3
         |        << n, $g2
         |      end
         |    end
         |  end
         |end
         |""".stripMargin
    }
    val cont = "each_row.continue().next()"
    val classes: Seq[(String, Seed => String)] = Seq(
      "mixed_rev_top" -> (s => d3(".reverse()", "0", "n += 1",
        Some(draw(Gen.oneOf("n > get_hour(stamp)", "n >= get_hour(stamp)"), s.slide.next)),
        cont, s)),
      "contra_union" -> { s =>
        val (init, inc, g) = draw(Gen.oneOf(
          ("0", "n += 1", "get_hour(stamp) < n"),
          ("80", "n -= 7", "product_price >= n")), s.slide.next)
        // round 15: deepest limits compose with the union (rank filter),
        // and the hop window follows any direction — forward look_ahead,
        // aligned reverse look_back, or a framed-restart bracket
        val lim = draw(Gen.oneOf("", "", ".limit(1)", ".limit(2)"),
          s.slide.next.next.next)
        val sp = draw(genSpan, s.slide.next.next)
        val deep = draw(Gen.oneOf(
          s"$cont.look_ahead($sp)",
          s"$cont.reverse().look_back($sp)",
          s"each_row.from(1).look_back($sp)"), s.slide.slide)
        d3("", init, inc, Some(g), s"$deep$lim", s)
      },
      "contra_two_sided" -> (s => d3("", "0", "n += 1",
        Some("get_hour(stamp) < n && n <= get_hour(stamp) + 6"),
        s"$cont.look_ahead(${draw(genSpan, s.slide.next)})", s)),
      "double_row" -> { s =>
        val (inc, g) = draw(Gen.oneOf(
          ("n += 1", "product_price > n"), ("n += 2", "n < product_price"),
          ("n += 3", "product_price.is(>= n)")), s.slide.next)
        d3("", "0", inc, Some(g), cont, s)
      },
      "rev_deep_limited" -> (s => d3("", "0", "n += 1", None,
        s"$cont.reverse().look_back(${draw(genSpan, s.slide.next)})" +
          s".limit(${draw(genLim, s.slide.next.next)})", s)),
      "restart_deep" -> { s =>
        val deep = draw(Gen.oneOf(
          "each_row.from(1)", "each_row.from(0).look_ahead(18_hours)",
          "each_row.from(1).limit(2)"), s.slide.next)
        d3("", "0", "n += 1", None, deep, s)
      },
      "restart_framed_lim" -> { s =>
        val frame = draw(Gen.oneOf(".look_back(24_hours)",
          ".look_ahead(18_hours)", ".within(15_hours, stamp)"), s.slide.next)
        val lim = draw(genLim, s.slide.next.next)
        draw(Gen.oneOf(1, 2, 3, 4), s.slide.next.next.next) match {
          case 1 => // depth-3 deepest: the ladder's (G, K) collect
            d3("", "0", "n += 1", None,
              s"each_row.from(1)$frame.limit($lim)", s)
          case 2 => // depth-4 middle: the same branch at its level
            d4(s"each_row.from(1)$frame.limit($lim)", cont, s)
          case 4 => // depth-3 MIDDLE: collect path, n + G(s0) min-term
            val w0 = draw(genWhere, s)
            val w1 = draw(genWhere, s.next)
            val w2 = draw(genWhere, s.next.next)
            val g2 = draw(genGroup, s.slide)
            s"""${sel}n = 0
               |each_row where $w0
               |  n += 1
               |  each_row.from(1)$frame.limit($lim) where $w1
               |    each_row.continue().next() where $w2
               |      << n, $g2
               |    end
               |  end
               |end
               |""".stripMargin
          case _ => // depth 2: the spawn tuple carries G, spawnOk prices
            val w0 = draw(genWhere, s)
            val w1 = draw(genWhere, s.next)
            val g2 = draw(genGroup, s.slide)
            s"""${sel}n = 0
               |each_row where $w0
               |  n += 1
               |  each_row.from(1)$frame.limit($lim) where $w1
               |    << n, $g2
               |  end
               |end
               |""".stripMargin
        }
      },
      "mid_direction" -> { s =>
        val mid = draw(Gen.oneOf(
          s"$cont.look_ahead(${draw(genSpan, s.slide.next.next)})",
          s"$cont.reverse().look_back(${draw(genSpan, s.slide.next.next)})",
          "each_row.from(1)"), s.slide.next)
        d4(mid, cont, s)
      },
      "fwd_mid_limited" -> (s =>
        d4(s"$cont.limit(${draw(genLim, s.slide.next)})", cont, s)),
      "rev_mid_limited" -> (s =>
        d4(s"$cont.reverse().look_back(${draw(genSpan, s.slide.next)})" +
           s".limit(${draw(genLim, s.slide.next.next)})", cont, s)),
      "mixed_deep_limited" -> (s => d3("", "0", "n += 1",
        Some("get_hour(stamp) > n"),
        s"$cont.look_ahead(${draw(genSpan, s.slide.next)})" +
          s".limit(${draw(genLim, s.slide.next.next)})", s)),
      "dyn_where_cap" -> { s =>
        val w0 = draw(genWhere, s)
        val g2 = draw(genGroup, s.next)
        val (init, inc, cap) = draw(Gen.oneOf(
          ("0", "n += 1", "n < product_price"),
          ("0", "n += product_price", "n < 120"),
          ("0", "n += 1", "get_hour(stamp) >= n")), s.next.next)
        // round 15 second act: a JOINT second gating accumulator on half
        // the draws (one GatedFold, (n, m, vis) buffer)
        val dual = draw(Gen.oneOf(true, false), s.next.next.next)
        if (dual)
          s"""${sel}n = $init
             |m = 0
             |each_row where $w0 && $cap && m < get_hour(stamp)
             |  $inc
             |  m += 1
             |  << n, $g2
             |end
             |""".stripMargin
        else
          s"""${sel}n = $init
             |each_row where $w0 && $cap
             |  $inc
             |  << n, $g2
             |end
             |""".stripMargin
      })
    val counts = scala.collection.mutable.Map.empty[String, Int]
    (1 to 39).foreach { i =>
      val (nm, build) = classes((i - 1) % classes.size)
      counts(nm) = counts.getOrElse(nm, 0) + 1
      val script = build(Seed(i.toLong * 6700417))
      val p = Parser.program(script)
      assert(TierA.compile(p, chainWorld, Mon + 100 * H, 1800000L).isDefined,
        s"class $nm sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on class $nm sample $i:\n$script\nA=$a\nB=$b")
    }
    classes.foreach { case (nm, _) =>
      assert(counts.getOrElse(nm, 0) >= 3, s"class $nm drew < 3") }
  }

  test("random continue().next() chains: Tier A == Tier B (40 seeded samples)") {
    val params = Gen.Parameters.default
    (1 to 40).foreach { i =>
      val script = genChainScript.pureApply(params, Seed(i.toLong * 104729))
      val p = Parser.program(script)
      assert(TierA.compile(p, chainWorld, Mon + 100 * H, 1800000L).isDefined,
        s"chain sample $i did not compile to Tier A:\n$script")
      val a = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(chainWorld, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch on chain sample $i:\n$script\nA=$a\nB=$b")
    }
  }
}

package graft

import graft.osl._

/** Round-9 Tier A feature: accumulator reads in the top-level WHERE — the
  * canonical stateful-cap script `n = 0; each_row where event.is(== 'x')
  * && n < 3 { n += 1 ... }`. The where observes the PRE-increment value,
  * and once a pure-accumulator conjunct fails n freezes, so the visited
  * set is the first m* residual-where matches: a static `.limit(m*)`
  * solved at compile time (TierA.capSolve). Tier B is the authority. */
class TierWhereCapSpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val H = 3600000L

  private lazy val world = {
    val rnd = new scala.util.Random(29)
    val events = Seq("purchase", "view", "signup", "error")
    val products = Seq("rod", "reel", "net", "fly")
    (0 until 80).map { i =>
      (s"u${i % 6}", Mon + (i / 6) * 5 * H + (i % 6) * H,
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

  test("canonical cap: n < 3 visits the first 3 matches per person") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase') && n < 3
         |  n += 1
         |  << 'capped', event
         |end
         |""".stripMargin)
  }

  test("every comparator solves: <=, ==, !=, > and >= with negative inc") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n <= 2
         |  n += 1
         |  << 'le', event
         |end
         |""".stripMargin)
    diff( // == init: exactly the first match visits
      s"""${sel}n = 0
         |each_row where event.is(== 'view') && n == 0
         |  n += 1
         |  << 'first', product_name
         |end
         |""".stripMargin)
    diff( // != freezes at the unique failing ordinal
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n != 2
         |  n += 1
         |  << 'ne', event
         |end
         |""".stripMargin)
    diff( // countdown: n -= and a > floor
      s"""${sel}n = 5
         |each_row where event.is(!= 'error') && n > 2
         |  n -= 1
         |  << 'down', event
         |end
         |""".stripMargin)
    diff(
      s"""${sel}n = 5
         |each_row where event.is(!= 'error') && n >= 3
         |  n -= 1
         |  << 'down_ge', event
         |end
         |""".stripMargin)
    diff( // literal on the left flips the comparator
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && 3 > n
         |  n += 1
         |  << 'flipped', event
         |end
         |""".stripMargin)
  }

  test("inc > 1, cap 0, and an inert conjunct") {
    diff( // n jumps by 2: 0,2,4 pass n<5, 6 fails -> 3 visits
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < 5
         |  n += 2
         |  << 'by2', event
         |end
         |""".stripMargin)
    diff( // init already fails -> zero visits everywhere
      s"""${sel}n = 7
         |each_row where event.is(!= 'error') && n < 3
         |  n += 1
         |  << 'never', event
         |end
         |""".stripMargin)
    diff( // increasing n can never fail n >= 0 -> conjunct is inert
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase') && n >= 0
         |  n += 1
         |  << 'inert', event
         |end
         |""".stripMargin)
  }

  test("cap composes with .limit / .reverse / .from and frames") {
    diff( // explicit .limit tighter than the cap, and vice versa
      s"""${sel}n = 0
         |each_row.limit(2) where event.is(!= 'error') && n < 4
         |  n += 1
         |  << 'lim2', event
         |end
         |""".stripMargin)
    diff(
      s"""${sel}n = 0
         |each_row.limit(5) where event.is(!= 'error') && n < 2
         |  n += 1
         |  << 'cap2', event
         |end
         |""".stripMargin)
    diff( // reverse: the LAST 3 matches visit (scan from the end)
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'view') && n < 3
         |  n += 1
         |  << 'rev', event
         |end
         |""".stripMargin)
    diff( // .from(2): matches count from row index 2
      s"""${sel}n = 0
         |each_row.from(2) where event.is(!= 'error') && n < 2
         |  n += 1
         |  << 'from2', event
         |end
         |""".stripMargin)
    diff( // top frame gates the scanned range before the cap counts
      s"""${sel}n = 0
         |each_row.look_ahead(30_hours, first_stamp) where event.is(!= 'error') && n < 2
         |  n += 1
         |  << 'framed', event
         |end
         |""".stripMargin)
  }

  test("cap plus body reads: the window column still counts visited rows") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < 4
         |  n += 1
         |  << n, event
         |end
         |""".stripMargin)
    diff( // two accumulators: one caps the where, the other keys the tally
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(!= 'error') && n < 3
         |  n += 1
         |  k += 2
         |  << k, event
         |end
         |""".stripMargin)
  }

  test("cap on a chain top: level 0 spawns only while the cap holds") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < 2
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << 'chained', event
         |  end
         |end
         |""".stripMargin)
    diff( // cap + chain + read below the step (spawn-bound value)
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < 3
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("round-9 features compose: cap + chain + ever-read below the step") {
    // where-cap (first 2 signups), accumulator read below the chain step in
    // BOTH a tally group and an ever operand — one script through the
    // static-cap solve, spawn-tuple enumeration and late-bound compare
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < 2
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    if product_price.ever(> n * 20)
         |      << 'pricey_history', event
         |    end
         |    << n, event
         |  end
         |end
         |""".stripMargin)
  }

  test("DYNAMIC caps compile: accumulator vs row value (round 15)") {
    // the reference's canonical budget pattern (queryinterpreter.cpp
    // where-eval + vars-first lookup): a spend cap compared against a ROW
    // value. A failing row does NOT freeze the scan — the GatedFold
    // window replays the sequential (acc, vis) recurrence exactly.
    diff( // fp increments: the fold IS the interpreter's add sequence
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase') && n < product_price
         |  n += product_price
         |  << 'dyn', event
         |end
         |""".stripMargin)
    diff( // flipped operand order, int increments
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && product_price > n
         |  n += 1
         |  << 'dynflip', event
         |end
         |""".stripMargin)
    diff( // computed row side (the top-where mixed form)
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && get_hour(stamp) >= n
         |  n += 1
         |  << 'dynhour', event
         |end
         |""".stripMargin)
    diff( // guarded increment under a STATIC cap: capSolve has no constant
      // slope, so the conjunct re-routes through the fold (was a pinned
      // decline through round 14)
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < 3
         |  if event.is(== 'purchase')
         |    n += 1
         |  end
         |  << 'guarded', event
         |end
         |""".stripMargin)
    diff( // prop increment under a static cap: the OTHER budget flavor
      // (was a pinned decline through round 14)
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase') && n < 100
         |  n += product_price
         |  << 'prop_inc', event
         |end
         |""".stripMargin)
    diff( // dynamic + static conjuncts on the SAME accumulator AND both
      // operand orders at once
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < product_price && n < 50
         |  n += product_price
         |  << 'dynboth', event
         |end
         |""".stripMargin)
    diff( // body reads observe the fold's post-visit value
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < product_price
         |  n += 1
         |  << n, event
         |end
         |""".stripMargin)
    diff( // a SECOND accumulator: its window runs over the vis-filtered
      // frame; its own static cap composes as a post-fold visit rank
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(!= 'error') && n < product_price && k < 9
         |  n += product_price
         |  k += 2
         |  << k, event
         |end
         |""".stripMargin)
  }

  test("dynamic caps compose with .limit/.reverse/.from/frames (round 15)") {
    diff( // `.limit(n)` becomes a post-fold visit rank
      s"""${sel}n = 0
         |each_row.limit(2) where event.is(!= 'error') && n < product_price
         |  n += product_price
         |  << 'dynlim', event
         |end
         |""".stripMargin)
    diff( // reverse: the fold rides the same DESC running frame
      s"""${sel}n = 0
         |each_row.reverse() where event.is(!= 'error') && n < product_price
         |  n += product_price
         |  << 'dynrev', event
         |end
         |""".stripMargin)
    diff( // reverse + limit: both walk from the scan's end
      s"""${sel}n = 0
         |each_row.reverse().limit(3) where event.is(!= 'error') && product_price > n
         |  n += 1
         |  << 'dynrevlim', event
         |end
         |""".stripMargin)
    diff( // `.from(k)`: candidates start at row index k
      s"""${sel}n = 0
         |each_row.from(2) where event.is(!= 'error') && n < product_price
         |  n += product_price
         |  << 'dynfrom', event
         |end
         |""".stripMargin)
    diff( // a top frame gates the candidate range before the fold
      s"""${sel}n = 0
         |each_row.look_ahead(30_hours, first_stamp) where event.is(!= 'error') && n < product_price
         |  n += product_price
         |  << 'dynframe', event
         |end
         |""".stripMargin)
  }

  test("dynamic caps: negative prices and nil row sides (round 15)") {
    import spark.implicits._
    // negative sides: a negative running spend keeps passing/failing per
    // the exact compare; nil sides follow Value.cmp's string path — a
    // numeric left vs "" makes {>, >=, !=} hold and {<, <=, ==} fail
    val wneg = (0 until 60).map { i =>
      (s"g${i % 3}", Mon + i * H,
        Seq("purchase", "view", "error")(i % 3) ,
        if (i % 7 == 0) None
        else Some(Seq(-12.5, 3.25, -0.5, 40.0, 7.75, -20.0)(i % 6)))
    }.toDF("id", "stamp", "event", "product_price").cache()
    def diffN(script: String, expectTierA: Boolean = true): Unit = {
      val p = Parser.program(script)
      assert(TierA.compile(p, wneg, Mon + 100 * H, 1800000L).isDefined == expectTierA,
        s"Tier A compile expected=$expectTierA for:\n$script")
      val a = canon(OslEngine.query(wneg, script, now = Mon + 100 * H))
      val b = canon(OslEngine.query(wneg, script, now = Mon + 100 * H,
        forceTierB = true))
      assert(a == b, s"tier mismatch:\n$script\nA=$a\nB=$b")
    }
    val selN = "select\n  count id as customers\n  count event as n_rows\nend\n"
    for (op <- Seq("<", "<=", ">", ">=", "==", "!="))
      diffN(
        s"""${selN}n = 0
           |each_row where event.is(!= 'error') && n $op product_price
           |  n += product_price
           |  << 'op', event
           |end
           |""".stripMargin)
    diffN( // negative init and a decreasing literal stage mixed in
      s"""${selN}n = -5
         |each_row where event.is(!= 'error') && n <= product_price
         |  n += product_price
         |  n -= 1
         |  << 'mixed', event
         |end
         |""".stripMargin)
    // JOINT gates over the nil/negative world (round 15 second act): the
    // dual fold's per-gate nil handling and both fp stage groups replay
    // the interpreter's exact sequence through negative and nil sides
    for (op <- Seq("<", ">=", "!="))
      diffN(
        s"""${selN}n = 0
           |k = 3
           |each_row where event.is(!= 'error') && n $op product_price && k >= get_hour(stamp)
           |  n += product_price
           |  k -= 1
           |  << 'dual', event
           |end
           |""".stripMargin)
    diffN( // a carried read below a chain step through the nil world
      s"""${selN}n = 0
         |each_row where event.is(== 'purchase') && n < product_price
         |  n += product_price
         |  each_row.continue().next() where event.is(== 'view')
         |    << bucket(n, 10), event
         |  end
         |end
         |""".stripMargin)
  }

  test("JOINT fold buffer: multiple gating accumulators (round 15)") {
    // `n < price && k < hour` with both names incremented: ONE GatedFold
    // whose buffer is the (acc_0…acc_{n−1}, vis) tuple — a visit needs
    // EVERY gate to pass and every gating accumulator updates on a visit
    // (the interpreter's vars-first pre-increment where-eval).
    diff( // two dynamic row sides (the flipped round-15 decline pin)
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(!= 'error') && n < product_price && k < stamp
         |  n += product_price
         |  k += 1
         |  << 'two', event
         |end
         |""".stripMargin)
    diff( // dual budget: fp spend gate + int visit gate
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(== 'purchase') && n < product_price && k < get_hour(stamp)
         |  n += product_price
         |  k += 1
         |  << k, event
         |end
         |""".stripMargin)
    diff( // one dynamic side + one fold-needing STATIC (prop slope): the
      // static conjunct joins its accumulator's gate as a constant side
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(!= 'error') && n < product_price && k < 120
         |  n += 1
         |  k += product_price
         |  << 'mixed', event
         |end
         |""".stripMargin)
    diff( // static conjunct on a gating name joins that gate; nonzero init
      s"""${sel}n = 0
         |k = 5
         |each_row where event.is(!= 'error') && n < product_price && n < 200 && k >= get_hour(stamp)
         |  n += product_price
         |  k -= 1
         |  << 'three', event
         |end
         |""".stripMargin)
    diff( // reverse top: both folds ride the same DESC running frame
      s"""${sel}n = 0
         |k = 0
         |each_row.reverse() where event.is(!= 'error') && n < product_price && k < get_hour(stamp)
         |  n += product_price
         |  k += 2
         |  << 'rev', event
         |end
         |""".stripMargin)
    diff( // chain top: the joint vis gates which rows spawn
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(== 'signup') && n < product_price && k < get_hour(stamp)
         |  n += product_price
         |  k += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << 'chained2', event
         |  end
         |end
         |""".stripMargin)
    diff( // body reads of BOTH gating names ride their fold fields
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(!= 'error') && n < product_price && k < get_hour(stamp)
         |  n += 1
         |  k += 2
         |  << bucket(n + k, 2), event
         |end
         |""".stripMargin)
    diff( // a read of a gating name below a chain step (round 15 third
      // act, `carried`): k has int-literal increments, so the ordinal
      // path serves it — spawns ARE the fold's visits, value = init+c·j
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(== 'signup') && n < product_price && k < get_hour(stamp)
         |  n += product_price
         |  k += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << k, event
         |  end
         |end
         |""".stripMargin)
  }

  test("carried caps: gating-name reads below chain steps (round 15)") {
    // spawns ARE the fold's visits, so the gating accumulator joins the
    // chain machinery like any other accumulator: affine init + c·j on
    // the ordinal path (int-literal increments), the tuple-carried
    // `__acc_` fold column on the collect path (prop/guarded increments)
    diff( // int-literal increments: ordinal path
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    diff( // fp prop increments: the collect path carries the fold column
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < 150
         |  n += product_price
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << bucket(n, 60), event
         |  end
         |end
         |""".stripMargin)
    diff( // guarded increments: collect path too
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < product_price
         |  if product_price.is(> 10)
         |    n += 2
         |  end
         |  each_row.continue().next() where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    diff( // read at depth 3 (the reachability ladder binds the ordinal)
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
    diff( // mixed guard READING the gating name on an inner step
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    if get_hour(stamp) > n
         |      each_row.continue().next() where event.is(== 'purchase')
         |        << n, event
         |      end
         |    end
         |  end
         |end
         |""".stripMargin)
    diff( // dual gates, both names read below the step
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(== 'signup') && n < product_price && k < get_hour(stamp)
         |  n += product_price
         |  k += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << bucket(n + k, 50), event
         |  end
         |end
         |""".stripMargin)
    diff( // `.limit` (post-fold rank) composes with a below-chain read
      s"""${sel}n = 0
         |each_row.limit(3) where event.is(!= 'error') && n < product_price
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    diff( // decline stays: a read in the chain step's own WHERE
      // (evaluates during the scan, not at the spawn)
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  each_row.continue().next() where product_price > n
         |    << n, event
         |  end
         |end
         |""".stripMargin, expectTierA = false)
  }

  test("dynamic caps on CHAIN TOPS: the fold gates which rows spawn (round 15)") {
    // the GatedFold's candidacy child evaluates the residual where in-row
    // (witness windows need every row — no pre-filter); vis gates spawns,
    // and `.limit`/static-other-acc caps compose as a post-fold visit rank
    diff( // canonical: budget-capped signups spawn a purchase funnel
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += product_price
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << 'chained', event
         |  end
         |end
         |""".stripMargin)
    diff( // top-level body read of the gating name (fold column) + chain
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  << n, event
         |  each_row.continue().next() where event.is(== 'view')
         |    << 'seen', event
         |  end
         |end
         |""".stripMargin)
    diff( // `.limit` composes as the post-fold visit rank
      s"""${sel}n = 0
         |each_row.limit(2) where event.is(!= 'error') && n < product_price
         |  n += product_price
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << 'lim', event
         |  end
         |end
         |""".stripMargin)
    diff( // computed row side + a framed chain step below
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && get_hour(stamp) >= n
         |  n += 1
         |  each_row.continue().next().look_ahead(30_hours) where event.is(== 'purchase')
         |    << 'framed', event
         |  end
         |end
         |""".stripMargin)
    diff( // a SECOND accumulator read below the step still binds per spawn
      s"""${sel}n = 0
         |k = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += product_price
         |  k += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << k, event
         |  end
         |end
         |""".stripMargin)
    diff( // depth 3 below a dynamic top cap
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << 'deep', event
         |    end
         |  end
         |end
         |""".stripMargin)
    diff( // REVERSE chain top: the fold and the spawn set both walk the
      // mirrored running frame
      s"""${sel}n = 0
         |each_row.reverse() where event.is(== 'signup') && n < product_price
         |  n += product_price
         |  each_row.continue().next() where event.is(== 'purchase')
         |    << 'rev', event
         |  end
         |end
         |""".stripMargin)
    diff( // a step GUARD reading the gating name in TOP scope observes the
      // fold column at the spawn row (an in-step read would decline)
      s"""${sel}n = 0
         |each_row where event.is(== 'signup') && n < product_price
         |  n += product_price
         |  if n < 120
         |    each_row.continue().next() where event.is(== 'purchase')
         |      << 'guarded', event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("declines stay Tier B: non-conjunct reads and unpriceable shapes") {
    diff( // read under || is not a conjunct cap
      s"""${sel}n = 0
         |each_row where event.is(== 'purchase') || n < 3
         |  n += 1
         |  << 'or', event
         |end
         |""".stripMargin, expectTierA = false)
    // TWO gating accumulators compile since the round-15 second act
    // (joint fold buffer) — see the "JOINT fold buffer" test below
    diff( // non-numeric row side: the interpreter string-compares per row
      s"""${sel}n = 0
         |each_row where event.is(!= 'error') && n < product_name
         |  n += 1
         |  << 'str', event
         |end
         |""".stripMargin, expectTierA = false)
    // reads of the GATING name below a chain step compile since the
    // round-15 third act (`carried` caps) — see the dedicated test
    diff( // |init| past 2^51: the int fold leaves the exact double range
      s"""${sel}n = 9007199254740992
         |each_row where event.is(!= 'error') && n < product_price
         |  n -= 1
         |  << 'huge', event
         |end
         |""".stripMargin, expectTierA = false)
  }
}

package graft

import graft.osl._

/** Round-8 Tier A feature: ever/never tests whose comparison operand is
  * CURRENT-ROW-DEPENDENT — accumulator reads (`price.ever(> n)`) and row
  * columns (`price.ever(>= budget)`). The interpreter evaluates the operand
  * once per visit in the visiting row's scope and compares every scanned
  * row's prop against it; Tier A now models that as scanned-prop aggregates
  * (min/max/collect_set + null flag) compared at the visiting row. Tier B
  * is the authority; every case asserts Tier A compiled AND agrees. */
class TierEverReadSpec extends SparkSpec {
  import spark.implicits._

  private val Mon = 1704067200000L
  private val H = 3600000L

  // nulls included deliberately: Value.eq/cmp treat VNone via the string
  // fallback ("" vs digit strings), which the compiled path must mirror
  private lazy val world = {
    val rows = Seq(
      ("u1", Mon + 0 * H, "signup", "rod", Some(10.0), Some(5.0)),
      ("u1", Mon + 1 * H, "view", "reel", Some(60.0), Some(100.0)),
      ("u1", Mon + 2 * H, "purchase", "rod", None, Some(1.0)),
      ("u1", Mon + 3 * H, "purchase", "net", Some(3.0), None),
      ("u2", Mon + 0 * H, "view", "fly", Some(2.0), Some(2.0)),
      ("u2", Mon + 5 * H, "purchase", "fly", Some(2.0), Some(3.0)),
      ("u3", Mon + 0 * H, "error", "rod", None, None))
    rows.toDF("id", "stamp", "event", "product_name", "product_price", "budget")
      .cache()
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

  private val sel = "select\n  count id as customers\n  count event as n_rows\nend\n"

  test("accumulator read in ever operand: all six comparators") {
    for (op <- Seq(">", ">=", "<", "<=", "==", "!=")) {
      diff(
        s"""${sel}n = 0
           |each_row where event.is(!= 'nothing')
           |  n += 2
           |  if product_price.ever($op n)
           |    << 'hit', event
           |  end
           |  << 'all', event
           |end
           |""".stripMargin)
    }
  }

  test("accumulator read under never") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'nothing')
         |  n += 1
         |  if product_price.never(> n * 20)
         |    << 'calm', event
         |  end
         |end
         |""".stripMargin)
  }

  test("row-column operand: scanned prop vs the visiting row's budget") {
    // pre-round-8 Tier A would have compared budget at the SCANNED row —
    // the interpreter compares the CURRENT row's budget (null on some rows)
    for (op <- Seq(">", ">=", "<", "<=", "==", "!=")) {
      diff(
        s"""${sel}each_row where event.is(!= 'nothing')
           |  if product_price.ever($op budget)
           |    << 'hit', event
           |  end
           |  << 'all', event
           |end
           |""".stripMargin)
    }
  }

  test("framed ever with accumulator operand (cursor-anchored look_back)") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'nothing')
         |  n += 1
         |  if product_price.look_back(2_hours).ever(< n)
         |    << 'recent_low', event
         |  end
         |end
         |""".stripMargin)
  }

  test("ever read in tally-predicate position composes with guards and groups") {
    diff(
      s"""${sel}n = 0
         |each_row.limit(3) where event.is(!= 'nothing')
         |  n += 1
         |  if event.ever(== 'purchase') && product_price.ever(>= n)
         |    << bucket(n, 2), event
         |  end
         |end
         |""".stripMargin)
  }

  // round 9: ever-reads BELOW a chain step — the operand observes the
  // SPAWN's accumulator value, so the compiled compare re-derives per
  // collected spawn tuple (TierA realB late binding)
  test("ever read below a chain step observes the spawn's value") {
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(!= 'error')
         |    if product_price.ever(> n * 50)
         |      << 'big_history', event
         |    end
         |    << n, event
         |  end
         |end
         |""".stripMargin)
    // never + a different accumulator shape, operand mixing row prop
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'error')
         |  n += 2
         |  each_row.continue().next() where event.is(== 'purchase')
         |    if budget.never(<= n)
         |      << 'rich', product_name
         |    end
         |    << 'all', event
         |  end
         |end
         |""".stripMargin)
    // framed (cursor-anchored) ever below the step
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'view')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'purchase')
         |    if product_price.look_back(4_hours).ever(>= n)
         |      << 'recent_ge', event
         |    end
         |  end
         |end
         |""".stripMargin)
    // depth-3: ever-read at the deepest level
    diff(
      s"""${sel}n = 0
         |each_row where event.is(== 'signup')
         |  n += 1
         |  each_row.continue().next() where event.is(== 'view')
         |    each_row.continue().next() where event.is(== 'purchase')
         |      if product_price.ever(< n * 10)
         |        << 'cheap_seen', event
         |      end
         |      << n, event
         |    end
         |  end
         |end
         |""".stripMargin)
  }

  test("declining shapes still fall to Tier B: string prop, frame reads") {
    // string prop with row-dependent operand -> interpreter string compare,
    // not modeled -> Tier B
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'nothing')
         |  n += 1
         |  if product_name.ever(== n)
         |    << 'weird', event
         |  end
         |end
         |""".stripMargin, expectTierA = false)
    // accumulator read in the FRAME -> Tier B
    diff(
      s"""${sel}n = 0
         |each_row where event.is(!= 'nothing')
         |  n += 1
         |  if product_price.look_back(n).ever(> 0)
         |    << 'framed', event
         |  end
         |end
         |""".stripMargin, expectTierA = false)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.operators.{EventOps, Segments}

/** Semantics mirrored from the reference's unit fixtures:
  * sessions (`test/test_sessions.h`), funnels (`README.md:244-316`),
  * segment algebra (`src/queryinterpreter.cpp:624-888`). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private val M = TimeFns.MinuteMs

  test("sessionize: gap > 30min starts a new session; session_count = max") {
    // user 1: events at 0, 10m, 200m, 205m -> sessions 1,1,2,2
    // user 2: single event -> session 1
    val e = Seq(
      (1L, 0L * M, "a"), (1L, 10 * M, "b"), (1L, 200 * M, "c"), (1L, 205 * M, "d"),
      (2L, 50 * M, "a")
    ).toDF("id", "stamp", "event")
    val out = EventOps.sessionize(e).orderBy("id", "stamp")
      .select("id", "session").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("sessionize honors custom gap") {
    val e = Seq((1L, 0L, "a"), (1L, 5 * M, "b")).toDF("id", "stamp", "event")
    assert(EventOps.sessionize(e, gapMs = 4 * M)
      .agg(max("session")).as[Long].head() == 2L)
    assert(EventOps.sessionize(e, gapMs = 6 * M)
      .agg(max("session")).as[Long].head() == 1L)
  }

  test("funnel2: first from-event anchors; to-event must follow within window") {
    val e = Seq(
      // converts: signup@10, purchase@20
      (1L, 10L, "signup"), (1L, 20L, "purchase"),
      // no conversion: purchase before signup only
      (2L, 5L, "purchase"), (2L, 10L, "signup"),
      // conversion outside window
      (3L, 0L, "signup"), (3L, 1000L, "purchase"),
      // never signed up
      (4L, 7L, "purchase")
    ).toDF("id", "stamp", "event")
    val f = EventOps.funnel2(e, "signup", "purchase", withinMs = 100L)
    val rows = f.orderBy("id")
      .select("id", "first_from", "first_to_after")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.toSeq == Seq(
      (1L, Some(10L), Some(20L)),
      (2L, Some(10L), None),
      (3L, Some(0L), None),
      (4L, None, None)))
  }

  test("segment algebra matches set semantics") {
    val e = Seq(
      (1L, 1L, "buy"), (2L, 1L, "buy"), (3L, 1L, "view"), (4L, 1L, "view")
    ).toDF("id", "stamp", "event")
    val buyers = Segments.fromRowPredicate(e, col("event") === "buy")
    val viewers = Segments.fromRowPredicate(e, col("event") === "view")
    val uni = e.select("id").distinct()
    assert(Segments.population(buyers) == 2)
    assert(Segments.population(Segments.intersection(buyers, viewers)) == 0)
    assert(Segments.population(Segments.union(buyers, viewers)) == 4)
    assert(Segments.population(Segments.difference(uni, buyers)) == 2)
    assert(Segments.compliment(uni, buyers).as[Long].collect().toSet == Set(3L, 4L))
  }

  test("bitmap segments: distributed aggregation + algebra match set semantics") {
    import graft.functions.IdBitmap
    // ids spanning several 64Ki chunks, aggregated across partitions
    val buyerIds = Seq(1L, 70000L, 70001L, 1000000L, 5L)
    val viewerIds = Seq(5L, 70001L, 9L, 2000000L)
    val buyers = buyerIds.toDF("id").repartition(4)
    val viewers = viewerIds.toDF("id").repartition(3)
    val b = Segments.membershipBitmap(buyers)
    val v = Segments.membershipBitmap(viewers)
    assert(b.cardinality == 5 && v.cardinality == 4)
    assert(b.and(v).toSeq.toSet == (buyerIds.toSet & viewerIds.toSet))
    assert(b.or(v).cardinality == (buyerIds.toSet | viewerIds.toSet).size)
    assert(b.andNot(v).toSeq.toSet == (buyerIds.toSet -- viewerIds.toSet))
    assert(buyerIds.forall(b.contains) && !b.contains(2L) && !b.contains(2000000L))
    // algebra agrees with the DataFrame set algebra on the same memberships
    assert(b.and(v).cardinality ==
      Segments.population(Segments.intersection(buyers, viewers)))
    assert(b.or(v).cardinality ==
      Segments.population(Segments.union(buyers, viewers)))
    // serialization round-trip
    assert(IdBitmap.deserialize(b.serialize()).toSeq == b.toSeq)
  }

  test("membershipBitmaps: one-pass multi-segment build equals per-segment builds") {
    // r17: several bitmaps from ONE aggregation over a shared per-person
    // frame must yield exactly the per-predicate membershipBitmap results,
    // null/non-matching ids skipped, across partitions and 64Ki chunks
    val per = Seq(
      (1L, 10.0, 3L), (70000L, 700.0, 1L), (70001L, 650.0, 80L),
      (1000000L, 0.0, 90L), (5L, 601.0, 70L)
    ).toDF("id", "pv", "c").repartition(4)
    val bms = Segments.membershipBitmaps(per, Seq(
      "high" -> (col("pv") > 600.0),
      "active" -> (col("c") >= 70L),
      "universe" -> lit(true)))
    val high = Segments.membershipBitmap(per.where(col("pv") > 600.0).select("id"))
    val active = Segments.membershipBitmap(per.where(col("c") >= 70L).select("id"))
    val universe = Segments.membershipBitmap(per.select("id"))
    assert(bms("high").toSeq == high.toSeq)
    assert(bms("active").toSeq == active.toSeq)
    assert(bms("universe").toSeq == universe.toSeq)
    assert(bms("high").andNot(bms("active")).toSeq.toSet == Set(70000L))
  }

  test("funnelN chains steps within the window of the previous step") {
    val e = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "c"),   // full a->b->c
      (2L, 10L, "a"), (2L, 200L, "b"),                  // b too late
      (3L, 10L, "a"), (3L, 20L, "b"), (3L, 300L, "c"),  // c too late
      (4L, 20L, "b"), (4L, 30L, "c")                    // never entered
    ).toDF("id", "stamp", "event")
    val f = EventOps.funnelN(e, Seq("a", "b", "c"), withinMs = 50L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(f(1L) == ((Some(10L), Some(20L), Some(25L))))
    assert(f(2L) == ((Some(10L), None, None)))
    assert(f(3L) == ((Some(10L), Some(20L), None)))
    assert(f(4L) == ((None, None, None)))
  }

  test("transitions counts consecutive event pairs per person") {
    val e = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "a", 3L),
      (2L, 10L, "a", 4L), (2L, 20L, "b", 5L)
    ).toDF("id", "stamp", "event", "event_id")
    val t = EventOps.transitions(e, col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(t(("a", "b")) == ((2L, 2L))) // both people
    assert(t(("b", "a")) == ((1L, 1L))) // only person 1
  }

  test("paths counts n-step sequences per person") {
    val e = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "c", 3L), (1L, 40L, "a", 4L),
      (2L, 10L, "a", 5L), (2L, 20L, "b", 6L), (2L, 30L, "c", 7L)
    ).toDF("id", "stamp", "event", "event_id")
    val p = EventOps.paths(e, 3, col("event_id"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p("a>b>c") == ((2L, 2L))) // both people
    assert(p("b>c>a") == ((1L, 1L))) // only person 1's tail
    assert(p.size == 2)              // person 2 has no 4th event
  }

  test("last-touch attribution credits the most recent preceding touch") {
    val e = Seq(
      // person 1: click then purchase -> click credited; later view then purchase
      (1L, 10L, "click", 1L, 5.0), (1L, 20L, "purchase", 2L, 10.0),
      (1L, 30L, "view", 3L, 0.0), (1L, 40L, "purchase", 4L, 20.0),
      // person 2: purchase with no preceding touch -> direct
      (2L, 10L, "purchase", 5L, 7.0)
    ).toDF("id", "stamp", "event", "event_id", "value")
    val a = EventOps.lastTouchAttribution(e, "purchase", Seq("click", "view"), col("event_id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(a("click") == ((1L, 1L, 10.0)))
    assert(a("view") == ((1L, 1L, 20.0)))
    assert(a("direct") == ((1L, 1L, 7.0)))
  }

  test("sketch tier tracks the exact tier within declared error") {
    val dir = "/root/testdata/sf0.001"
    // the registry queries now carry their tolerance CONTRACT in-row
    // (round-16 #3: exact comparator + bound verdict, oracle-hash-gated);
    // assert every verdict is true and the exact tier matches its twin
    val exact = Queries.queries("q_daily_active")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Queries.queries("q_daily_active_approx")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (day, (ex, ok)) =>
      assert(ex == exact(day), s"day $day: exact tier disagrees")
      assert(ok, s"day $day: HLL outside the declared ±5% contract")
    }
    // raw sketch error, pinned tighter than the query's contract
    val e = Tables.events(spark, dir)
    val raw = e.groupBy(graft.functions.TimeFns.startOfDay(col("stamp")).as("d"))
      .agg(approx_count_distinct(col("id"), rsd = 0.02).as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    raw.foreach { case (day, a) =>
      assert(math.abs(a - exact(day)).toDouble / exact(day) < 0.1,
        s"day $day: approx $a vs exact ${exact(day)}")
    }
    val approxP = Queries.queries("q_value_percentiles_approx")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val exactP = Queries.queries("q_value_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap // p50
    assert(approxP.keySet == exactP.keySet)
    approxP.foreach { case (ev, (ok50, ok90, ok99)) =>
      assert(ok50 && ok90 && ok99,
        s"event $ev: percentile sketch outside the declared rank-ε contract")
    }
    // raw p50 sketch error vs the exact tier, tighter than the contract
    val rawP = e.groupBy(col("event"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rawP.foreach { case (ev, a) =>
      val ex = exactP(ev)
      assert(math.abs(a - ex) / math.max(math.abs(ex), 1e-9) < 0.05,
        s"event $ev: approx p50 $a vs exact $ex")
    }
  }

  test("RFM classes by fixed thresholds") {
    val day = 86400000L
    val now = 100L * day
    val e = Seq(
      // person 1: 12 purchases, last 2 days ago, 60 value -> recent/high/low
      (1 to 12).map(i => (1L, now - 2 * day - i, "purchase", 5.0)),
      // person 2: 1 purchase 40 days ago, 600 value -> lapsed/low/high
      Seq((2L, now - 40 * day, "purchase", 600.0)),
      // person 3: non-purchaser, excluded
      Seq((3L, now - day, "view", 1.0))
    ).flatten.toDF("id", "stamp", "event", "value")
    val out = EventOps.rfm(e, "purchase", nowMs = now)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("recent", "high", "low")) == ((1L, 60.0)))
    assert(out(("lapsed", "low", "high")) == ((1L, 600.0)))
    assert(out.size == 2)
  }

  test("ever/never person-level existence") {
    val e = Seq((1L, 1L, "err"), (1L, 2L, "ok"), (2L, 1L, "ok"))
      .toDF("id", "stamp", "event")
    val ev = EventOps.ever(e, col("event") === "err")
      .as[(Long, Boolean)].collect().toMap
    assert(ev == Map(1L -> true, 2L -> false))
  }

  test("trim keeps top-k per parent with deterministic tie-break") {
    val g = Seq(("x", "a", 10L), ("x", "b", 10L), ("x", "c", 5L), ("y", "d", 1L))
      .toDF("grp", "child", "n")
    val out = EventOps.trim(g, Seq("grp"), col("n"), col("child"), 2)
      .select("grp", "child").as[(String, String)].collect().toSet
    assert(out == Set(("x", "a"), ("x", "b"), ("y", "d")))
  }

  test("asofJoin: latest at-or-before right row, left-join semantics") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 9L, "p3"))
      .toDF("id", "stamp", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 50L, 9.0))
      .toDF("id", "rstamp", "v")
    val out = EventOps.asofJoin(left, right, "id", "stamp", "rstamp", Seq("v"))
      .select("tag", "asof_rstamp", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      ("p0", None, None),                 // nothing at or before 5
      ("p1", Some(10L), Some(1.0)),       // inclusive: rstamp == stamp matches
      ("p2", Some(15L), Some(2.0)),       // latest of {10, 15}
      ("p3", None, None)))                // right row is in the future
  }

  test("asofJoin tolerance nulls stale matches") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("id", "stamp", "tag")
    val right = Seq((1L, 95L, 1.0)).toDF("id", "rstamp", "v")
    val out = EventOps.asofJoin(left, right, "id", "stamp", "rstamp", Seq("v"),
        toleranceMs = Some(10L))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out == Map("a" -> Some(1.0), "b" -> None)) // 200-95 > 10 -> stale
  }

  test("TopK aggregator: bounded buffer, deterministic ties, cross-partition merge") {
    val d = Seq(("a", 5.0, 1L), ("a", 7.0, 2L), ("a", 7.0, 1L), ("a", 1.0, 9L),
      ("b", 3.0, 3L)).toDF("k", "ord", "p").repartition(4) // force merges
    val f = graft.functions.TopK.topK(2)
    val out = d.groupBy(col("k")).agg(f(col("ord"), col("p")).as("t"))
      .select(col("k"), col("t"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    // ord desc, payload asc: (7.0,1) before (7.0,2); 5.0 and 1.0 cut
    assert(out("a") == Seq((7.0, 1L), (7.0, 2L)))
    assert(out("b") == Seq((3.0, 3L)))
  }

  test("winsorizedStats clips at discrete percentile bounds, hand-computed") {
    // key "a": 1..19 plus one outlier 1000 (n=20). Discrete bounds:
    // lo = value at rank ceil(0.05*20)=1 -> 1; hi = rank ceil(0.95*20)=19
    // -> 19. The outlier clips to 19: mean = (1+..+19 + 19)/20 = 10.45.
    val d = ((1 to 19).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
      .toDF("k", "v")
    val r = EventOps.winsorizedStats(d, col("k"), col("v"), 0.05, 0.95)
      .as[(String, Long, Double, Double, Long, Double)].head()
    assert(r == (("a", 20L, 1.0, 19.0, 1L, 10.45)))
  }
}

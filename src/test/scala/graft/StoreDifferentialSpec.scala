package graft

import java.nio.file.Files

/** Randomized differential for the catalog STORE (round 16) — the same
  * method the Tier-A differential uses for the query compiler, pointed at
  * the storage layer: random sequences of raw-JSON inserts (group-commit
  * WALs at several thresholds), flushes, property DDL and cold "restarts"
  * (a fresh Api/Catalog over the same warehouse — new caches, new locks),
  * checked after EVERY operation against an independent in-memory model.
  *
  * Model semantics (culls disabled — eventMax huge, TTL far in the past —
  * so the contract under test is pure upsert visibility): the store holds
  * the SET of distinct logical rows (id, stamp, event, props...) — the
  * reference's (id, stamp, z-rank, row-hash) replace key collapses exact
  * duplicates (within a batch, across batches, and across WAL replays)
  * and keeps everything else. Reads must see acked rows immediately
  * (WAL overlay), across restarts, and identically through the bucketed
  * manifest path and the per-customer pruned fetch.
  *
  * Shapes deliberately covered: duplicate (id, stamp) pairs with different
  * props (both kept), exact duplicate rows (one kept), numeric AND textual
  * id tables, tiny bucket counts (forced collisions), flush thresholds
  * 0/2/50 (eager / small group / WAL-resident), property add mid-history
  * (old rows read null), and reads through a fresh process image.
  */
class StoreDifferentialSpec extends SparkSpec {

  private val T0 = 1704067200000L

  private case class MRow(id: String, stampSec: Long, event: String,
                          value: Option[Double])

  test("randomized insert/flush/DDL/restart sequences match the set model") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      val idTextual = rnd.nextBoolean()
      val flushRows = Seq(0, 2, 50)(rnd.nextInt(3))
      val buckets = Seq(2, 4, 32)(rnd.nextInt(3))
      val wh = Files.createTempDirectory(s"graft_diff$seed").toString
      var api = new Api(spark, wh)
      api.tableCreate(TableMeta("t",
        Seq(PropDef("value", "double")),
        TableSettings(idTextual = idTextual, eventMax = 1000000,
          storageBuckets = buckets, flushRows = flushRows)))

      val model = scala.collection.mutable.LinkedHashSet.empty[MRow]
      val events = Seq("signup", "view", "purchase")
      def ids = if (idTextual) Seq("u0", "u1", "u2", "u3") else Seq("0", "1", "2", "3")

      def randRow(): MRow = MRow(
        ids(rnd.nextInt(ids.size)),
        1704067200L + rnd.nextInt(6), // dense stamps: (id, stamp) collisions
        events(rnd.nextInt(events.size)),
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(5).toDouble))

      def json(r: MRow): String = {
        val idJs = if (idTextual) s""""${r.id}"""" else r.id
        val v = r.value.map(d => s""","value":$d""").getOrElse("")
        s"""{"id":$idJs,"stamp":${r.stampSec},"event":"${r.event}"$v}"""
      }

      def check(ctx: String): Unit = {
        val got = api.catalog.events("t")
          .collect()
          .map(r => MRow(String.valueOf(r.get(0)), r.getLong(1) / 1000L,
            r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          .toSet
        assert(got == model.toSet,
          s"seed $seed [$ctx] store != model\n missing=${(model.toSet -- got).take(5)}" +
            s"\n extra=${(got -- model.toSet).take(5)}")
        // per-customer pruned fetch agrees for one random id
        val probe = ids(rnd.nextInt(ids.size))
        val lookup: Any = if (idTextual) probe else probe.toLong
        val fetched = api.catalog.customerEvents("t", lookup).count()
        assert(fetched == model.count(_.id == probe),
          s"seed $seed [$ctx] pruned fetch for $probe: $fetched vs " +
            s"${model.count(_.id == probe)}")
      }

      for (op <- 1 to 10) {
        rnd.nextInt(10) match {
          case n if n <= 5 => // raw-JSON insert, 1-4 rows, maybe exact dups
            val fresh = Seq.fill(1 + rnd.nextInt(3))(randRow())
            val replay = if (model.nonEmpty && rnd.nextBoolean())
              Seq(model.toSeq(rnd.nextInt(model.size))) else Nil
            val batch = rnd.shuffle(fresh ++ replay ++
              (if (rnd.nextInt(3) == 0) fresh.take(1) else Nil)) // in-batch dup
            api.insert("t", batch.map(json), nowMs = T0)
            model ++= batch
            check(s"op$op insert")
          case 6 | 7 => // force-merge any pending WAL
            api.catalog.flush("t", T0)
            check(s"op$op flush")
          case 8 => // cold restart: fresh caches over the same warehouse
            api = new Api(spark, wh)
            check(s"op$op restart")
          case 9 => // DDL mid-history: add a property (old rows read null)
            val m = api.catalog.describe("t")
            val pname = s"p${m.properties.size}"
            if (m.properties.size < 4) {
              api.catalog.addProperty("t", PropDef(pname, "text"))
              // model unchanged: new column is null everywhere and the
              // check projects only the stable columns
            }
            check(s"op$op ddl")
        }
      }
      // final drain + restart: the committed state alone carries the model
      api.catalog.flush("t", T0)
      api = new Api(spark, wh)
      check("final")
    }
  }

  test("randomized dated-store model: framed reads, advancing clock, vacuum (round 17)") {
    // The date_partition layout faces the same differential as the flat
    // store: random inserts spread across ~30 days with an ADVANCING
    // clock, so rows age out through BOTH cull paths — merge-time TTL on
    // touched buckets and the metadata vacuum on whole expired dates —
    // checked after every op against an independent model, through the
    // full view, random eventsFramed windows (inclusive-widened date
    // semantics), and the pruned per-customer fetch.
    import org.apache.spark.sql.functions.{hash, lit => flit, pmod}
    import spark.implicits._
    val day = 86400000L
    val ttlMs = 12L * day
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(300 + seed)
      val buckets = Seq(2, 4)(rnd.nextInt(2))
      // seeds 1-2: cap never binds -> the DATE-SCOPED merge path commits
      // (only the batch's dates rewrite); seeds 3-4: eventMax=3 trips the
      // guard every insert -> SCOPED EVICTION (stamps are unique, so no
      // collapse/tie ambiguity forces the full merge after the seeding
      // insert); seeds 5-6: eventMax=3 AND 30% of rows REPLAY an existing
      // stamp — value/event are constant, so a reuse is an exact-duplicate
      // row: the store's upsert collapses it, the model's set semantics
      // collapse identically, and a replay touching an over-cap person
      // drives the guard's ambiguity fallback (full merge) — all three
      // guard tiers mixed randomly against ONE model.
      val eventMax = if (seed <= 2) 1000000 else 3
      val replayP = if (seed >= 5) 0.3 else 0.0
      val wh = Files.createTempDirectory(s"graft_dated$seed").toString
      var api = new Api(spark, wh)
      api.tableCreate(TableMeta("t",
        Seq(PropDef("value", "double")),
        TableSettings(idTextual = true, eventMax = eventMax, eventTtlMs = ttlMs,
          storageBuckets = buckets, datePartition = true)))
      val ids = Seq("u0", "u1", "u2", "u3", "u4")
      val bucketOf: Map[String, Int] = ids.map { id =>
        id -> ids.toDF("id").where($"id" === id)
          .select(pmod(hash($"id"), flit(buckets))).head().getInt(0)
      }.toMap

      final case class R(id: String, stampSec: Long)
      val committed = scala.collection.mutable.Map.empty[Int, Set[R]]
        .withDefaultValue(Set.empty)
      val usedStamps = scala.collection.mutable.Map.empty[String, Set[Long]]
        .withDefaultValue(Set.empty)
      def dayOf(stampSec: Long): Long = stampSec * 1000L / day
      def freshStamp(id: String): Long = {
        var s = 0L
        do s = T0 / 1000L + rnd.nextInt(30) * 86400L + rnd.nextInt(3600)
        while (usedStamps(id).contains(s))
        usedStamps(id) += s
        s
      }
      def pickStamp(id: String): Long =
        if (rnd.nextDouble() < replayP && usedStamps(id).nonEmpty) {
          val prior = usedStamps(id).toSeq.sorted
          prior(rnd.nextInt(prior.size)) // exact replay (possibly evicted)
        } else freshStamp(id)
      def modelVacuum(nowMs: Long): Unit = committed.keys.toSeq.foreach { b =>
        committed(b) = committed(b).filter(r =>
          (dayOf(r.stampSec) + 1) * day > nowMs - ttlMs)
      }
      def modelAll: Set[R] = committed.values.flatten.toSet
      def gotAll(): Set[R] = api.catalog.events("t").collect()
        .map(r => R(r.getString(0), r.getLong(1) / 1000L)).toSet

      var now = T0 + 5 * day
      for (op <- 1 to 8) {
        now += rnd.nextInt(4) * day // the clock only advances
        rnd.nextInt(10) match {
          case n if n <= 5 => // insert at the advanced clock
            val batch = Seq.fill(1 + rnd.nextInt(4)) {
              val id = ids(rnd.nextInt(ids.size))
              R(id, pickStamp(id))
            }
            api.insert("t", batch.map(r =>
              s"""{"id":"${r.id}","stamp":${r.stampSec},"event":"ev","value":1.0}"""),
              nowMs = now)
            val touched = batch.map(r => bucketOf(r.id)).toSet
            touched.foreach { b =>
              val merged = committed(b) ++ batch.filter(r => bucketOf(r.id) == b)
              val ttlOk = merged.filter(_.stampSec * 1000L >= now - ttlMs)
              // per-person cap (newest eventMax): scoped eviction and the
              // full merge both implement exactly this bucket-wide rule
              committed(b) = ttlOk.groupBy(_.id).flatMap { case (_, rs) =>
                rs.toSeq.sortBy(-_.stampSec).take(eventMax)
              }.toSet
            }
            modelVacuum(now) // insert runs the sweep inline
          case 6 | 7 => // explicit vacuum at the advanced clock
            api.catalog.vacuumExpired("t", nowMs = now)
            modelVacuum(now)
          case 8 => // cold restart
            api = new Api(spark, wh)
          case 9 => // framed read over a random window (checked below too)
            ()
        }
        assert(gotAll() == modelAll,
          s"seed $seed op$op full view diverged:\n missing=${(modelAll -- gotAll()).take(5)}" +
            s"\n extra=${(gotAll() -- modelAll).take(5)}")
        // random framed window: inclusive-widened DATE semantics
        val lo = T0 + rnd.nextInt(30) * day + rnd.nextInt(1000) * 1000L
        val hi = lo + rnd.nextInt(10) * day
        val framed = api.catalog.eventsFramed("t", lo, hi).collect()
          .map(r => R(r.getString(0), r.getLong(1) / 1000L)).toSet
        val wantFramed = modelAll.filter(r =>
          dayOf(r.stampSec) >= lo / day && dayOf(r.stampSec) <= hi / day)
        assert(framed == wantFramed,
          s"seed $seed op$op framed [$lo,$hi] diverged:" +
            s"\n missing=${(wantFramed -- framed).take(5)}" +
            s"\n extra=${(framed -- wantFramed).take(5)}")
        // pruned per-customer fetch
        val probe = ids(rnd.nextInt(ids.size))
        assert(api.catalog.customerEvents("t", probe).count() ==
          modelAll.count(_.id == probe), s"seed $seed op$op fetch $probe")
      }
    }
  }

  test("randomized retention model: eventMax + TTL cull exactly the touched buckets") {
    // Culls are PER-TOUCHED-BUCKET at insert time (the reference re-packs a
    // person's grid on insert, not table-wide): rows in untouched buckets
    // keep stale/overflow rows until their bucket is next written. The
    // model replicates that bucket-scoped application — ids map to buckets
    // through the same murmur3 the store uses.
    import org.apache.spark.sql.functions.{hash, lit => flit, pmod}
    import spark.implicits._
    val day = 86400000L
    val ttlMs = 10L * day
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(200 + seed)
      val buckets = Seq(2, 4)(rnd.nextInt(2))
      val wh = Files.createTempDirectory(s"graft_cull$seed").toString
      val api = new Api(spark, wh)
      api.tableCreate(TableMeta("t",
        Seq(PropDef("value", "double")),
        TableSettings(idTextual = true, eventMax = 3, eventTtlMs = ttlMs,
          storageBuckets = buckets))) // flushRows=0: every insert drains
      val ids = Seq("u0", "u1", "u2", "u3", "u4")
      val bucketOf: Map[String, Int] = ids.map { id =>
        id -> ids.toDF("id")
          .where($"id" === id)
          .select(pmod(hash($"id"), flit(buckets)))
          .head().getInt(0)
      }.toMap
      val cutoffSec = (T0 - ttlMs) / 1000L

      final case class R(id: String, stampSec: Long, event: String)
      // committed rows per bucket; unique stamps per person keep the
      // eventMax cull deterministic (ties would be arbitrary both sides)
      val committed = scala.collection.mutable.Map.empty[Int, Set[R]]
        .withDefaultValue(Set.empty)
      val usedStamps = scala.collection.mutable.Map.empty[String, Set[Long]]
        .withDefaultValue(Set.empty)

      def freshStamp(id: String): Long = {
        var s = 0L
        do {
          // straddle the TTL cutoff: ~1/3 of rows arrive already expired
          s = cutoffSec + rnd.nextInt(30) - 10
        } while (usedStamps(id).contains(s))
        usedStamps(id) += s
        s
      }

      for (op <- 1 to 6) {
        val batch = Seq.fill(1 + rnd.nextInt(4)) {
          val id = ids(rnd.nextInt(ids.size))
          R(id, freshStamp(id), "ev")
        }
        api.insert("t",
          batch.map(r => s"""{"id":"${r.id}","stamp":${r.stampSec},"event":"${r.event}","value":1.0}"""),
          nowMs = T0)
        // model: merge + cull ONLY the touched buckets
        val touched = batch.map(r => bucketOf(r.id)).toSet
        touched.foreach { b =>
          val merged = committed(b) ++ batch.filter(r => bucketOf(r.id) == b)
          val ttlOk = merged.filter(_.stampSec * 1000L >= T0 - ttlMs)
          val capped = ttlOk.groupBy(_.id).flatMap { case (_, rs) =>
            rs.toSeq.sortBy(-_.stampSec).take(3)
          }.toSet
          committed(b) = capped
        }
        val got = api.catalog.events("t").collect()
          .map(r => R(r.getString(0), r.getLong(1) / 1000L, r.getString(2))).toSet
        val want = committed.values.flatten.toSet
        assert(got == want,
          s"seed $seed op $op retention diverged:\n missing=${(want -- got).take(5)}" +
            s"\n extra=${(got -- want).take(5)}")
      }
    }
  }
}

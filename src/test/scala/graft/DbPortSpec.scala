package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Port of the reference's `test/test_db.h` — the end-to-end database suite:
  * mixed-type JSON insert → schema registration → person-grid content →
  * OSL set-column iteration with customer-prop write-back → framed reverse
  * chains. Assertions mirror the reference's observable expectations
  * (`test/test_db.h:103-409`) on our surfaces (Api/Catalog/OslEngine).
  */
class DbPortSpec extends SparkSpec {
  import spark.implicits._

  // test_db.h:21-59 — user1's four page_view events (the second carries the
  // full mixed-type property load; two carry a referral_search set).
  private val user1Events = Seq(
    """{"id":"user1@test.com","stamp":"1458820830","event":"page_view","page":"blog"}""",
    """{"id":"user1@test.com","stamp":"1458820840","event":"page_view","page":"home page",
      |"referral_source":"google.co.uk","referral_search":["big","floppy","slippers"]}"""
      .stripMargin.replace("\n", ""),
    """{"id":"user1@test.com","stamp":"1458820841","event":"page_view","page":"home page",
      |"referral_source":"google.co.uk","referral_search":["silly","floppy","ears"]}"""
      .stripMargin.replace("\n", ""),
    """{"id":"user1@test.com","stamp":"1458820900","event":"page_view","page":"about"}""")

  // test_db.h:106-116 — the table's property registry: event props (page,
  // referral_*) plus is_customer props of every scalar type and a set.
  private def testMeta = TableMeta("test001",
    Seq(
      PropDef("page", "text"),
      PropDef("referral_source", "text"),
      PropDef("referral_search", "text", isSet = true),
      PropDef("prop_set", "text", isSet = true, isCustomer = true),
      PropDef("prop_txt", "text", isCustomer = true),
      PropDef("prop_bool", "bool", isCustomer = true),
      PropDef("prop_int", "int", isCustomer = true),
      PropDef("prop_float", "double", isCustomer = true)),
    TableSettings())

  private def freshApi(): Api =
    new Api(spark, Files.createTempDirectory("graft_wh").toString)

  test("test_db port: schema registration after create (test_db.h:103-127)") {
    val api = freshApi()
    api.tableCreate(testMeta)
    val m = api.catalog.describe("test001")
    // the reference counts built-ins + declared props (propertyCount == 13);
    // ours: declared props all present, plus the id/stamp/event built-ins
    // materialized on the events schema
    assert(m.properties.map(_.name).toSet == Set("page", "referral_source",
      "referral_search", "prop_set", "prop_txt", "prop_bool", "prop_int", "prop_float"))
    val ev = api.catalog.events("test001")
    assert(Seq("id", "stamp", "event", "page", "referral_source",
      "referral_search").forall(ev.columns.contains))
    assert(m.properties.find(_.name == "referral_search").exists(_.isSet))
    assert(m.properties.find(_.name == "prop_set").exists(p => p.isSet && p.isCustomer))
  }

  test("test_db port: grid content after insert (test_db.h:130-215)") {
    val api = freshApi()
    api.tableCreate(testMeta)
    api.insert("test001", user1Events, nowMs = 1458820900000L)
    val grid = api.catalog.customerEvents("test001", "user1@test.com")
    val rows = grid.orderBy(col("stamp")).collect()
    assert(rows.length == 4)                                   // rowVector.size() == 4
    assert(grid.select(col("stamp")).distinct().count() == 4)  // timeStamps.size() == 4
    assert(grid.where(col("referral_source").isNotNull)        // referral_sources == 1
      .select(col("referral_source")).distinct().count() == 1)
    assert(grid.select(explode(col("referral_search")))        // referral_searches == 5
      .distinct().count() == 5)
    assert(grid.select(col("page")).distinct().count() == 3)   // pages.size() == 3
    // stamp seconds normalized to millis (insert type matrix)
    assert(rows.head.getAs[Long]("stamp") == 1458820830000L)
  }

  test("test_db port: set-column iteration skips nil rows (test_db.h:227-288)") {
    val api = freshApi()
    api.tableCreate(testMeta)
    api.insert("test001", user1Events, nowMs = 1458820900000L)
    // the reference's script iterates `for ref in referral_search` inside
    // each_row where page != nil; rows with a nil set are skipped, so the
    // loop body runs 6 times (3 refs × 2 rows) — debug(counter == 6)
    val script =
      """select
        |  count id
        |  count session
        |  count page
        |  count referral_source
        |end
        |counter = 0
        |each_row where page.is(!= nil)
        |  for ref in referral_search
        |    counter = counter + 1
        |    << id, referral_source, ref
        |  end
        |end
        |""".stripMargin
    val out = graft.osl.OslEngine.query(
      api.catalog.events("test001"), script, now = 1458820900000L)
    // 5 distinct refs at the deepest level ('floppy' tallies once per person)
    assert(out.where(col("depth") === 3).count() == 5)
    assert(out.where(col("depth") === 3).select(col("g3"))
      .as[String].collect().toSet == Set("big", "floppy", "slippers", "silly", "ears"))
    // root totals: 1 person, 1 session, counts over tallied rows —
    // the reference's "_" node c == [1,1,2,2] (test_db.h:284)
    val root = out.where(col("depth") === 1)
      .select(col("id"), col("session"), col("page"), col("referral_source")).head()
    assert((root.getLong(0), root.getLong(1), root.getLong(2), root.getLong(3))
      == ((1L, 1L, 2L, 2L)))
  }

  test("test_db port: OSL prop write-back persists customer props (test_db.h:230-345)") {
    val api = freshApi()
    api.tableCreate(testMeta)
    api.insert("test001", user1Events, nowMs = 1458820900000L)
    // script one: assign every customer prop (test_db.h:237-247)
    api.catalog.runPropWriteback("test001",
      """prop_set = set()
        |prop_set = prop_set + 'hello'
        |prop_set = prop_set + 'goodbye'
        |prop_txt = 'poodle'
        |prop_bool = true
        |prop_int = 123
        |prop_float = 123.456
        |""".stripMargin, nowMs = 1458820900000L)
    // script two re-reads them in a later query ("are props still set"):
    // each condition tallies one marker node when true — all five must hold
    val enriched = graft.operators.CustomerProps.enrich(
      api.catalog.events("test001"), api.catalog.customers("test001"))
    val script2 =
      """select
        |  count id
        |end
        |if 'hello' in prop_set
        |  << 'set_ok'
        |end
        |if prop_txt == 'poodle'
        |  << 'txt_ok'
        |end
        |if prop_bool == true
        |  << 'bool_ok'
        |end
        |if prop_int == 123
        |  << 'int_ok'
        |end
        |if prop_float == 123.456
        |  << 'float_ok'
        |end
        |""".stripMargin
    val out = graft.osl.OslEngine.query(enriched, script2, now = 1458820900000L)
    val markers = out.where(col("depth") === 1).select(col("g1"))
      .as[String].collect().toSet
    assert(markers == Set("set_ok", "txt_ok", "bool_ok", "int_ok", "float_ok"))
    // and the bitmap-index analogue: population of prop_set='hello' is 1,
    // the never-assigned value 'huge' is 0 (test_db.h:330-339)
    val profile = api.catalog.customers("test001")
    assert(profile.where(array_contains(col("prop_set"), "hello")).count() == 1)
    assert(profile.where(array_contains(col("prop_set"), "huge")).count() == 0)
  }

  test("test_db port: framed reverse chains (test_db.h:350-409 within 10s vs 100s)") {
    val api = freshApi()
    api.tableCreate(testMeta)
    api.insert("test001", user1Events, nowMs = 1458820900000L)
    // last 'home page' row anchors (reverse.limit(1)); a backward frame of
    // 10s reaches only one earlier page_view, 100s reaches two — the
    // reference asserts c==[1,2] (test2) and c==[1,1] (test1) after sorting
    val script =
      """select
        |  count id
        |  count page
        |end
        |each_row.reverse().limit(1) where page == 'home page'
        |  match_stamp = stamp
        |  each_row.continue().next().reverse().within(10_seconds, match_stamp) where event == 'page_view'
        |    << 'test1', 'home_page', page
        |  end
        |end
        |each_row.reverse().limit(1) where page == 'home page'
        |  match_stamp = stamp
        |  each_row.continue().next().reverse().within(100_seconds, match_stamp) where event == 'page_view'
        |    << 'test2', 'home_page', page
        |  end
        |end
        |""".stripMargin
    val out = graft.osl.OslEngine.query(
      api.catalog.events("test001"), script, now = 1458820900000L)
    val roots = out.where(col("depth") === 1)
      .select(col("g1"), col("id"), col("page")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(roots("test1") == ((1L, 1L))) // 10s window: one reachable row
    assert(roots("test2") == ((1L, 2L))) // 100s window: two distinct pages
  }
}

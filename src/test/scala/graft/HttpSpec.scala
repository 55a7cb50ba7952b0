package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.nio.file.Files

/** End-to-end HTTP round-trips over a real socket, porting the reference's
  * curl walkthrough (README.md:44-420: cluster init → create `highstreet` →
  * insert JSON events → event query → segments → property (+ segment
  * compare) → customer) plus the subscription lifecycle and the error
  * envelope (src/errors.cpp:41-51). */
class HttpSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def withServer(f: (String, Api) => Unit): Unit = {
    val api = new Api(spark, Files.createTempDirectory("graft_http").toString)
    val http = new Http(api).start()
    try f(s"http://127.0.0.1:${http.port}", api)
    finally http.stop()
  }

  private def req(method: String, url: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val r = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m        => b.method(m, BodyPublishers.ofString(body))
    }
    client.send(r.build(), BodyHandlers.ofString())
  }

  test("reference curl walkthrough: init, create, insert, query, property, customer") {
    withServer { (base, _) =>
      // step 4: cluster init (a Spark-managed no-op; same ack shape)
      val init = req("PUT", s"$base/v1/cluster/init?partitions=24")
      assert(init.statusCode() == 200 && init.body().contains("server_name"))

      // step 5: create table `highstreet` (README's body shape)
      val create = req("POST", s"$base/v1/table/highstreet",
        """{
          |  "id_type": "textual",
          |  "properties": [
          |    {"name": "product_name", "type": "text"},
          |    {"name": "product_price", "type": "double"},
          |    {"name": "product_group", "type": "text", "is_set": true}
          |  ],
          |  "event_order": ["purchase", "cart_item"]
          |}""".stripMargin)
      assert(create.body() == """{"message":"created","table":"highstreet"}""")
      assert(req("GET", s"$base/v1/tables").body()
        == """{"tables":["highstreet"]}""")
      assert(req("GET", s"$base/v1/table/highstreet").body()
        .contains(""""is_set":true"""))

      // step 6: insert events (samples-repo array format); "yummy" ack
      val now = 1704067200L
      val ins = req("POST", s"$base/v1/insert/highstreet?now=${now * 1000}",
        s"""[
           |{"id":"u1","stamp":$now,"event":"cart_item","product_name":"fly rod","product_price":99.95,"product_group":["outdoor","angling"]},
           |{"id":"u1","stamp":${now + 60},"event":"cart_item","product_name":"gilded spoon","product_price":27.99,"product_group":["outdoor","angling"]},
           |{"id":"u2","stamp":$now,"event":"cart_item","product_name":"fly rod","product_price":99.95,"product_group":["outdoor","angling"]},
           |{"id":"u3","stamp":$now,"event":"cart_item","product_name":"shag rug","product_price":49.99,"product_group":["home"]}
           |]""".stripMargin)
      assert(ins.body() == """{"message":"yummy"}""")

      // step 7: event query — tally tree grouped by product_name
      val tree = req("POST",
        s"$base/v1/query/highstreet/event?now=${(now + 86400) * 1000}",
        """select
          |  count id
          |  count product_name as purchased
          |  sum product_price as total_spent
          |end
          |each_row where
          |    product_group.is(contains 'outdoor') &&
          |    product_name.is(in ['fly rod', 'gilded spoon'])
          |  << product_name
          |end
          |""".stripMargin).body()
      assert(tree.contains(""""g":"fly rod""""))
      assert(tree.contains(""""g":"gilded spoon""""))

      // step 8: segment queries (ever + chained cart shapes)
      val segs = req("POST",
        s"$base/v1/query/highstreet/segment?now=${(now + 86400) * 1000}",
        """@segment products_outdoor
          |if product_group.ever(contains 'outdoor')
          |  return(true)
          |end
          |@segment products_home
          |if product_group.ever(contains 'home')
          |  return(true)
          |end
          |""".stripMargin).body()
      assert(segs.contains("""{"segment":"products_outdoor","count":2}"""))
      assert(segs.contains("""{"segment":"products_home","count":1}"""))

      // step 9: property query — per-value customer counts
      val prop = req("GET", s"$base/v1/query/highstreet/property/product_name").body()
      assert(prop.contains("""{"value":"fly rod","customers":2}"""))

      // step 10: segment-compare mode via the batch route (@segment
      // membership refresh + @property counts in one script, like the
      // reference's ?segments=*,products_outdoor after a refresh)
      val batch = req("POST",
        s"$base/v1/query/highstreet/batch?now=${(now + 86400) * 1000}",
        """@segment products_outdoor refresh=5_minutes
          |if product_group.ever(contains 'outdoor')
          |  return(true)
          |end
          |
          |@use products_outdoor
          |
          |@property product_name
          |""".stripMargin).body()
      assert(batch.contains(""""value":"fly rod","counts":{"*":2,"products_outdoor":2}"""))
      assert(batch.contains(""""value":"shag rug","counts":{"*":1,"products_outdoor":0}"""))

      // property search-mode + bucket params ride the query string
      val bucketed = req("GET",
        s"$base/v1/query/highstreet/property/product_price?bucket=50&gt=20").body()
      assert(bucketed.contains(""""value":0""") || bucketed.contains(""""value":50"""))

      // customer fetch
      val cust = req("GET", s"$base/v1/query/highstreet/customer?id=u1").body()
      assert(cust.contains(""""id":"u1"""") && cust.contains("fly rod"))

      // status reports real executor topology from the status tracker
      val st = req("GET", s"$base/v1/status").body()
      assert(st.contains(""""tables":1"""))
      assert(st.contains(""""master":"local["""))
      assert(st.contains(""""executors":[{"host":"""))
      assert(st.contains(""""runningTasks":"""))
    }
  }

  test("schema evolution, settings, subscriptions and the error envelope") {
    withServer { (base, api) =>
      req("POST", s"$base/v1/table/shop",
        """{"properties":[{"name":"sku","type":"text"}]}""")
      // property add/drop
      val add = req("PUT", s"$base/v1/table/shop/property/coupon",
        """{"type":"text"}""")
      assert(add.body().contains(""""property":"coupon""""))
      assert(req("GET", s"$base/v1/table/shop").body().contains("coupon"))
      assert(req("DELETE", s"$base/v1/table/shop/property/coupon")
        .body().contains("dropped"))
      // settings keys follow the reference's serializeSettings names
      req("PUT", s"$base/v1/table/shop/settings",
        """{"session_time": 60, "event_max": 100}""")
      assert(api.catalog.describe("shop").settings.sessionTimeMs == 60000L)
      assert(api.catalog.describe("shop").settings.eventMax == 100)

      // subscription lifecycle over segment enter/exit events
      val now = 1704067200000L
      req("POST", s"$base/v1/insert/shop?now=$now",
        s"""[{"id":"u1","stamp":${now / 1000},"event":"buy","sku":"a1"}]""")
      val sub = req("PUT",
        s"$base/v1/subscription/shop/buyers/hook1?now=$now")
      assert(sub.body().contains(""""subscriber":"hook1""""))
      api.segmentRefresh("shop",
        """@segment buyers
          |if event.ever(== 'buy')
          |  return(true)
          |end
          |""".stripMargin, nowMs = now + 1000)
      val poll = req("GET",
        s"$base/v1/subscription/shop/buyers/hook1?now=${now + 2000}").body()
      assert(poll.contains(""""state":"entered"""") && poll.contains(""""count":1"""))
      // second poll: cursor advanced, feed drained
      assert(req("GET",
        s"$base/v1/subscription/shop/buyers/hook1?now=${now + 3000}")
        .body().contains(""""count":0"""))
      assert(req("DELETE", s"$base/v1/subscription/shop/buyers/hook1")
        .body().contains("unsubscribed"))

      // group-commit flush route: defer merges via flush_rows, then force
      req("PUT", s"$base/v1/table/shop/settings", """{"flush_rows": 1000}""")
      val gens0 = api.catalog.eventVersions("shop").size
      req("POST", s"$base/v1/insert/shop?now=$now",
        s"""[{"id":"u9","stamp":${now / 1000 + 60},"event":"buy","sku":"z9"}]""")
      assert(api.catalog.eventVersions("shop").size == gens0,
        "merge deferred below flush_rows")
      assert(req("POST", s"$base/v1/table/shop/flush?now=$now")
        .body().contains("flushed"))
      assert(api.catalog.eventVersions("shop").size == gens0 + 1,
        "flush commits the grouped generation")

      // error envelope: reference shape {"error":{"class","message","detail"}}
      val nf = req("GET", s"$base/v1/nope")
      assert(nf.statusCode() == 404 && nf.body().contains(""""error":{"class":"config""""))
      val bad = req("GET", s"$base/v1/query/shop/customer") // missing id=
      assert(bad.statusCode() == 400 && bad.body().contains(""""message":"general_error""""))
      // drop cleans up
      assert(req("DELETE", s"$base/v1/table/shop").body().contains("dropped"))
    }
  }
}

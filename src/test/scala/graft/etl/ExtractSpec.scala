package graft.etl

import graft.SparkSpec

class ExtractSpec extends SparkSpec {

  private def card(href: String, name: String, price: String,
                   sizes: Seq[String] = Seq("90 m²", "75 m²"),
                   attrs: Seq[String] = Seq("3", "2", "1"),
                   badge: String = "RumahCarportGarasi",
                   location: String = "Kebon Jeruk, Jakarta Barat"): String =
    s"""<div class="card-featured__middle-section">
       |  <div class="card-featured__middle-section__header-badge">$badge</div>
       |  <a class="quick-label-badge" href="/promo/x">promo</a>
       |  <a href="$href">listing</a>
       |  <h2>$name</h2>
       |  <div class="card-featured__middle-section__price"><strong>$price</strong></div>
       |  <span>$location</span>
       |  <span class="attribute-text">${attrs.lift(0).getOrElse("")}</span>
       |  <span class="attribute-text">${attrs.lift(1).getOrElse("")}</span>
       |  <span class="attribute-text">${attrs.lift(2).getOrElse("")}</span>
       |  <div class="attribute-info">${sizes.lift(0).getOrElse("")}</div>
       |  <div class="attribute-info">${sizes.lift(1).getOrElse("")}</div>
       |</div>
       |</div>""".stripMargin

  private val admins = Seq("Jakarta Barat", "Jakarta Selatan")

  test("parseCard extracts all fields; skips quick-label-badge anchor") {
    val r = Extract.parseCard(card("/properti/jkt/hos1", "Rumah Mewah", "Rp 1,5 Miliar"), admins)
    assert(r.link === "rumah123.com/properti/jkt/hos1")
    assert(r.name === "Rumah Mewah")
    assert(r.price_rp === "Rp 1,5 Miliar")
    assert(r.location === "Kebon Jeruk, Jakarta Barat")
    assert(r.lot_size === "90 m²")
    assert(r.building_size === "75 m²")
    assert((r.n_bedroom, r.n_bathroom, r.n_carport) === ("3", "2", "1"))
    assert(r.badge === "RumahCarportGarasi")
  }

  test("parseCard: empty location when no admin matches") {
    val r = Extract.parseCard(
      card("/p/1", "X", "Rp 1 Juta", location = "Bandung"), admins)
    assert(r.location === "")
  }

  test("fromPages explodes cards and attaches constants in scrape order") {
    import spark.implicits._
    val page1 = card("/p/a", "A", "Rp 1 Juta") + "\n" + card("/p/b", "B", "Rp 2 Juta")
    val page2 = card("/p/c", "C", "Rp 3 Juta")
    val df = Extract.fromPages(Seq((1, page1), (2, page2)).toDS(), "jual", "rumah", admins)
    val rows = df.orderBy("ingest_order").collect()
    assert(rows.map(_.getAs[String]("link")).toSeq ===
      Seq("rumah123.com/p/a", "rumah123.com/p/b", "rumah123.com/p/c"))
    assert(rows.forall(_.getAs[String]("ads_type") == "jual"))
    assert(rows.forall(_.getAs[String]("property_type") == "rumah"))
  }

  test("pipeline end-to-end: pages -> transform -> merge into existing") {
    import spark.implicits._
    val page = card("/p/a", "A", "Rp 1,5 Miliar") + "\n" + card("/p/b", "B", "Rp 2 Juta")
    val fresh = Pipeline.run(spark, Seq((1, page)).toDS(), "jual", "rumah", admins, None)
    assert(fresh.count() === 2)
    val priced = fresh.where("link = 'rumah123.com/p/a'").collect()(0)
    assert(priced.getAs[Long]("price_rp") === 1_500_000_000L)

    val main = fresh.drop("ingest_order")
    val page2 = card("/p/b", "B2", "Rp 3 Juta") + "\n" + card("/p/d", "D", "Rp 4 Juta")
    val merged = Pipeline.run(spark, Seq((1, page2)).toDS(), "jual", "rumah", admins, Some(main))
    val byLink = merged.collect().map(r => r.getAs[String]("link") -> r.getAs[String]("name")).toMap
    assert(byLink.keySet === Set("rumah123.com/p/a", "rumah123.com/p/b", "rumah123.com/p/d"))
    assert(byLink("rumah123.com/p/b") === "B2") // re-scrape overwrote
  }

  test("early-exit: pages after the first empty page are skipped") {
    import spark.implicits._
    val pages = Seq(
      (1, card("/p/a", "A", "Rp 1 Juta")),
      (2, "<html>no cards here</html>"),
      (3, card("/p/c", "C", "Rp 3 Juta")))
    val df = Extract.fromPagesWithEarlyExit(pages.toDS(), "jual", "rumah", admins)
    assert(df.collect().map(_.getAs[String]("link")).toSeq === Seq("rumah123.com/p/a"))
  }

  test("withRetry retries the configured number of times then succeeds/throws") {
    var calls = 0
    val got = Orchestration.withRetry(2) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    assert(got === "ok" && calls === 3)
    var calls2 = 0
    intercept[RuntimeException] {
      Orchestration.withRetry(1) { () => calls2 += 1; throw new RuntimeException("always") }
    }
    assert(calls2 === 2)
  }

  test("fetch loop: 429 backs off exponentially and retries the SAME page") {
    val script = Iterator((429, ""), (429, ""), (200, "<html>ok</html>"))
    val asked = scala.collection.mutable.ArrayBuffer[Int]()
    val fetcher = new PageFetcher {
      def fetch(page: Int, file: String): (Int, String) = { asked += page; script.next() }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
    val (html, limiter) = FetchLoop.fetchPage(
      fetcher, page = 7, file = "", RateLimiter().seeded, sleeps += _)
    assert(html === Some("<html>ok</html>"))
    assert(asked.toSeq === Seq(7, 7, 7), "429 must retry the same page")
    // politeness 1.0 → backoff 1.5 → politeness 1.5 → backoff 2.25 →
    // politeness 2.25 → 200 (reference politeness-sleep each attempt,
    // handle_rate_limit's exponential backoff between)
    assert(sleeps.toSeq === Seq(1.0, 1.5, 1.5, 2.25, 2.25))
    // success decays the (backed-off) sleep: max(1.0, 2.25 × 0.9)
    assert(math.abs(limiter.currentSleep - 2.025) < 1e-9)
  }

  test("fetch loop: non-429 error gives the page up after one plain backoff") {
    val fetcher = new PageFetcher {
      def fetch(page: Int, file: String): (Int, String) = (503, "")
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
    val (html, limiter) = FetchLoop.fetchPage(
      fetcher, 1, "", RateLimiter().seeded, sleeps += _)
    assert(html === None)
    assert(sleeps.toSeq === Seq(1.0, 1.5)) // politeness, then 1.5× once
    assert(limiter.currentSleep === 1.0, "other errors must not compound the base")
    assert(limiter.consecutiveSuccesses === 0)
  }

  test("fetch loop: the 429 retry cap bounds a permanently-limited page") {
    var attempts = 0
    val fetcher = new PageFetcher {
      def fetch(page: Int, file: String): (Int, String) = { attempts += 1; (429, "") }
    }
    val (html, _) = FetchLoop.fetchPage(
      fetcher, 1, "", RateLimiter().seeded, _ => (), max429Retries = 3)
    assert(html === None)
    assert(attempts === 4) // initial + 3 retries
  }

  test("withCleanup removes paths on success AND on failure, skipping missing ones") {
    def mk(): java.io.File = {
      val f = java.io.File.createTempFile("graft_clean", ".tmp")
      f.deleteOnExit(); f
    }
    val a = mk()
    val got = Orchestration.withCleanup(Seq(a.getPath, "/nonexistent/graft_x"))("done")
    assert(got === "done" && !a.exists())
    val b = mk()
    intercept[RuntimeException] {
      Orchestration.withCleanup(Seq(b.getPath))(throw new RuntimeException("boom"))
    }
    assert(!b.exists(), "cleanup must run on the failure path too (ALL_DONE)")
  }

  test("validate rejects bad domains") {
    intercept[IllegalArgumentException](Extract.validate("buy", "rumah", 1))
    intercept[IllegalArgumentException](Extract.validate("jual", "castle", 1))
    intercept[IllegalArgumentException](Extract.validate("jual", "rumah", 0))
  }

  test("shared limiter: state carries across sequential fetches on one key") {
    SharedLimiters.reset()
    val seed = RateLimiter(baseSleep = 2.0, minSleep = 1.0).seeded
    // first fetch backs off (429 observed somewhere in the loop)
    SharedLimiters.withShared("hostA", seed)(l => ((), l.onRateLimited))
    // the SECOND fetch on the same key must see the backed-off sleep —
    // task-local copies would restart from the 2.0 seed here
    val seen = SharedLimiters.withShared("hostA", seed)(l => (l.currentSleep, l.onSuccess))
    assert(seen === 3.0, "429 backoff must carry into the next page's fetch")
    // and the success decay is visible to a third caller
    assert(SharedLimiters.peek("hostA").get.currentSleep === math.max(1.0, 3.0 * 0.9))
    // different key = different politeness domain, untouched seed
    val other = SharedLimiters.withShared("hostB", seed)(l => (l.currentSleep, l))
    assert(other === 2.0)
    SharedLimiters.reset()
    assert(SharedLimiters.peek("hostA").isEmpty)
  }

  test("rate limiter: backoff, cap, decay tiers, floor") {
    var rl = RateLimiter()
    rl = rl.onRateLimited
    assert(rl.currentSleep === 1.5)
    (1 to 50).foreach(_ => rl = rl.onRateLimited)
    assert(rl.currentSleep === 600.0)
    rl = rl.onSuccess // 1 consecutive → ×0.9
    assert(rl.currentSleep === 540.0)
    rl = rl.onSuccess; rl = rl.onSuccess // 3rd → ×0.7
    assert(math.abs(rl.currentSleep - 540.0 * 0.9 * 0.7) < 1e-9)
    rl = rl.onSuccess; rl = rl.onSuccess // 5th → ×0.5
    (1 to 30).foreach(_ => rl = rl.onSuccess)
    assert(rl.currentSleep === 1.0) // floor
    val (lo, hi) = rl.jitterBounds
    assert(lo === 0.8 && hi === 1.2)
  }

  test("mini-yaml parses the reference config shapes") {
    val cfg = MiniYaml.parse(
      """# extract config
        |ads_type: jual
        |property_type: 'rumah'
        |num_pages: 20
        |admins:
        |  - Jakarta Barat
        |  - Jakarta Selatan
        |batch_size: 500
        |""".stripMargin)
    assert(cfg("ads_type") === "jual")
    assert(cfg("property_type") === "rumah")
    assert(cfg("num_pages") === 20)
    assert(cfg("admins") === List("Jakarta Barat", "Jakarta Selatan"))
    assert(cfg("batch_size") === 500)
  }

  test("mini-yaml keeps quoted '#' values, degrades big ints, treats quoted items as scalars") {
    val cfg = MiniYaml.parse(
      """name: 'region #2'   # trailing comment still stripped
        |big_id: 9999999999
        |huge: 99999999999999999999999999
        |items:
        |  - 'note: temp'
        |""".stripMargin)
    assert(cfg("name") === "region #2")
    assert(cfg("big_id") === 9999999999L)
    assert(cfg("huge") === "99999999999999999999999999")
    assert(cfg("items") === List("note: temp"))
  }

  test("mini-yaml: quoted numerics stay strings, unquoted become numbers") {
    val cfg = MiniYaml.parse(
      """code: '007'
        |n: 7
        |neg: "-12"
        |""".stripMargin)
    assert(cfg("code") === "007", "YAML quoting forces string")
    assert(cfg("n") === 7)
    assert(cfg("neg") === "-12")
  }

  test("mini-yaml parses the regions list-of-structs shape") {
    val cfg = MiniYaml.parse(
      """regions:
        |  - name: jakarta
        |    id: 1
        |    admins:
        |      - Jakarta Barat
        |      - Jakarta Selatan
        |    schedule: '0 0 * * *'
        |  - name: bogor
        |    id: 2
        |    admins:
        |      - Bogor
        |    schedule: '30 0 * * *'
        |num_pages: 20
        |""".stripMargin)
    val rs = MiniYaml.regions(cfg)
    assert(rs === Seq(
      RegionConfig("jakarta", 1, Seq("Jakarta Barat", "Jakarta Selatan"), "0 0 * * *"),
      RegionConfig("bogor", 2, Seq("Bogor"), "30 0 * * *")))
    assert(cfg("num_pages") === 20)
  }
}

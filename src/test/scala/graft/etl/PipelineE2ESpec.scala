package graft.etl

import graft.SparkSpec
import graft.sources.PageSource
import org.apache.spark.sql.functions._

/** The reference's full E1 DAG (SURVEY.md §3), end-to-end through the
  * real engine surfaces: DSv2 page source → distributed card parse →
  * transform chain → JSONL interchange → JDBC staging + server-side
  * merge into an actual database (embedded Derby) → read back and
  * check upsert semantics across two "daily" runs. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private def card(link: String, name: String, price: String): String =
    s"""<div class="card-featured__middle-section">
       |<a href="$link"><h2>$name</h2></a>
       |<div class="card-featured__middle-section__price"><strong>$price</strong></div>
       |<span>Kebon Jeruk, Jakarta Barat</span>
       |<div class="card-featured__middle-section__header-badge">RumahCarportGarasi</div>
       |</div></div>""".stripMargin

  private def writeDay(dir: String, cards: Seq[(String, String, String)]): Unit = {
    new java.io.File(dir).mkdirs()
    cards.grouped(2).zipWithIndex.foreach { case (pageCards, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/page-${i + 1}.html"),
        pageCards.map((card _).tupled).mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  test("pages -> parse -> transform -> jsonl -> Derby upsert, two daily runs") {
    val root = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val url = "jdbc:derby:memory:graftpipe;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE p_main (link VARCHAR(128) PRIMARY KEY, name VARCHAR(128), price_rp BIGINT)")
      st.execute("CREATE TABLE p_stg (link VARCHAR(128), name VARCHAR(128), price_rp BIGINT)")
      st.close()
    } finally conn.close()

    def runDay(day: Int, cards: Seq[(String, String, String)]): Unit = {
      val pagesDir = s"$root/day$day"
      writeDay(pagesDir, cards)
      val pages = spark.read.format("graft.sources.PageSource")
        .option("path", pagesDir).load().as[(Int, String)]
      val raw = Extract.fromPages(pages, "jual", "rumah", Seq("Jakarta"))
      val clean = Transform.transform(raw)
      // stage-boundary interchange (the reference's CSV hop, lossless)
      val staged = Load.datedJsonl(clean, "listings", s"$root/out$day",
        java.time.LocalDate.of(2024, 1, day))
      val back = spark.read.schema(clean.schema).json(staged)
      Load.jdbcUpsert(
        back.select(col("link"), col("name"), col("price_rp")),
        url, "p_stg", "p_main", "link", batchSize = 2, dialect = Load.AnsiMerge)
    }

    // day 1: two listings
    runDay(1, Seq(
      ("/properti/h1", "Rumah Satu", "Rp 1,5 Miliar"),
      ("/properti/h2", "Rumah Dua", "Rp 500 Juta")))
    // day 2: h2 re-scraped at a new price, h3 new
    runDay(2, Seq(
      ("/properti/h2", "Rumah Dua", "Rp 750 Juta"),
      ("/properti/h3", "Rumah Tiga", "Rp 2 Miliar")))

    val got = spark.read.jdbc(url, "p_main", new java.util.Properties)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got === Set(
      ("rumah123.com/properti/h1", 1_500_000_000L),
      ("rumah123.com/properti/h2", 750_000_000L),
      ("rumah123.com/properti/h3", 2_000_000_000L)))
  }
}

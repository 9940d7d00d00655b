package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.ops.{SparkDialect, SqlOps}

/** Dev utility: stage-by-stage timing of the n-gram jaccard pipeline. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables(spark, sfDir, "documents").createOrReplaceTempView("documents")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    val op = SqlOps.dedupNgramJaccard
    val stageSql = op.stages.head._2(SparkDialect)
    // sub-stage timings
    val d = SparkDialect
    timed("corpus+split+explode") {
      spark.sql(s"""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        ctoks AS (SELECT doc_id, split(text, ' ') AS toks FROM corpus)
        SELECT doc_id, pos, tkn FROM (SELECT doc_id, toks FROM ctoks)
        LATERAL VIEW posexplode(toks) _t AS pos, tkn""").count()
    }
    timed("+lead window") {
      spark.sql(s"""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        ctoks AS (SELECT doc_id, split(text, ' ') AS toks FROM corpus),
        tokp AS (SELECT doc_id, pos, tkn FROM (SELECT doc_id, toks FROM ctoks)
          LATERAL VIEW posexplode(toks) _t AS pos, tkn)
        SELECT doc_id, concat(tkn, ' ',
          LEAD(tkn, 1) OVER (PARTITION BY doc_id ORDER BY pos), ' ',
          LEAD(tkn, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS s
        FROM tokp""").count()
    }
    val stage = spark.sql(stageSql)
    timed("full stage (distinct)")(stage.count())
    // materialize BOTH stages exactly as SparkEntry.sqlStaged does (the
    // raw index nj_dsh, then the df<=20 rare-shingle cap nj_dshf) so the
    // body timings below profile the real q_dedup_ngram_jaccard pipeline
    op.stages.foreach { case (name, build) =>
      val path = s"/tmp/prof_stage/$name"
      timed(s"stage $name write") {
        spark.sql(build(SparkDialect)).write.mode("overwrite").parquet(path); 0L
      }
      spark.read.parquet(path).createOrReplaceTempView(name)
    }
    timed("cand groupby") {
      spark.sql(
        """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          |FROM nj_dshf a JOIN nj_dshf b ON a.s = b.s AND a.doc_id < b.doc_id
          |GROUP BY a.doc_id, b.doc_id""".stripMargin).count()
    }
    val body = spark.sql(op.body(SparkDialect))
    val plan = body.queryExecution.executedPlan.toString
    println("InMemoryTableScan count in body plan: " +
      "InMemoryTableScan".r.findAllIn(plan).length +
      ", parquet scans: " + "Scan parquet".r.findAllIn(plan).length)
    timed("full body")(body.count())
    timed("full body again")(spark.sql(op.body(SparkDialect)).count())
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter (local dev)]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    val rowCounts = scala.collection.mutable.Map.empty[String, Long]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // stale-output guard: an analysis-time failure throws BEFORE the
      // overwrite deletes anything, so a reused outDir would otherwise
      // keep the previous run's parquet and the compare would silently
      // pass on stale results — delete the target first
      try org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$outDir/$name"))
      catch { case scala.util.control.NonFatal(_) => () }
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // row-count sidecar: a 0-row result that hash-matches a 0-row
        // oracle is a VACUOUS pass (r9 shipped one — q_cms_topusers
        // proved only that nobody was frequent). Count the written
        // parquet (footer-cheap) so emptiness is visible in the
        // artifact, and flag any empty query not explicitly allowed.
        rowCounts(name) = spark.read.parquet(s"$outDir/$name").count()
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val flaggedEmpty = rowCounts.collect {
      case (n, 0L) if !SparkEntry.allowEmpty(n) => n
    }.toSeq.sorted
    flaggedEmpty.foreach { n =>
      System.err.println(
        s"[verify] VACUOUS: $n returned 0 rows and is not on " +
          "SparkEntry.allowEmpty — its oracle pass proves nothing")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // name → rows for every query that ran, plus the flagged-empty
    // list, so a vacuous (empty-vs-empty) oracle match can never hide
    // in the artifact again.
    val countsJson =
      rowCounts.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: $v" }
        .mkString("{\"rows\": {", ",", "}, ") +
      flaggedEmpty.map(q).mkString("\"flagged_empty\": [", ",", "]}")
    Files.writeString(Paths.get(s"$outDir/row_counts.json"), countsJson)
    spark.stop()
  }
}

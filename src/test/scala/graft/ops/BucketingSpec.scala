package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both sides bucketed by the join
  * key lets Spark plan a SortMergeJoin with NO shuffle exchange — the
  * core technique for repeated large-fact joins at 100 TB (pay the
  * shuffle once at write time, never at query time). This spec proves
  * the property at the plan level. */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end. Also clear leftover
    // location dirs — the in-memory catalog forgets tables across JVMs
    // but their directories survive.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }

    graft.Tables.orders(spark, sf001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, sf001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // tiny fixtures auto-broadcast; disable so the join strategy is the
    // one a 100 TB fact-fact join would get (SMJ)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the join itself must not introduce a shuffle: no exchange between
    // the scans and the SortMergeJoin (the final groupBy may shuffle)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")

    // correctness: same result as the unbucketed join
    val plainRows = graft.Tables.lineitem(spark, sf001)
      .join(graft.Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val bucketRows = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bucketRows === plainRows)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("hive-partitioned write prunes partitions at the scan, not post-filter") {
    // the third physical-layout lever next to bucketing and z-order:
    // a partitionBy(col) write turns an equality predicate into
    // directory pruning — the scan must list ONLY the matching
    // partition's files, proven both at the plan level
    // (PartitionFilters) and physically (inputFiles)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      graft.Tables.events(spark, sf001)
        .withColumn("ts", col("ts").cast("string")) // plain payload col
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
      val all = spark.read.parquet(dir)
      val types = all.select("event_type").distinct().collect().map(_.getString(0))
      assert(types.length > 2, "fixture should have several event types")
      val one = all.filter(col("event_type") === "purchase")
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
      assert(plan.contains("isnotnull(event_type") || plan.contains("event_type"),
        s"predicate missing from partition filters:\n$plan")
      // physically: execute THIS plan and read the scan's numFiles
      // metric — inputFiles reflects the unpruned relation, metrics
      // reflect what was actually listed and read
      val qe = one.queryExecution
      qe.toRdd.count()
      val scan = qe.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      val purchaseFiles = new java.io.File(s"$dir/event_type=purchase")
        .listFiles().count(_.getName.endsWith(".parquet"))
      val allFiles = types.map(t => new java.io.File(s"$dir/event_type=$t")
        .listFiles().count(_.getName.endsWith(".parquet"))).sum
      assert(purchaseFiles > 0 && allFiles > purchaseFiles)
      assert(scan.metrics("numFiles").value === purchaseFiles.toLong,
        s"scan should read only the purchase partition's $purchaseFiles files")
      // and the pruned read returns exactly the filtered rows
      assert(one.count() ===
        graft.Tables.events(spark, sf001).filter(col("event_type") === "purchase").count())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("z-order write bounds BOTH dimensions per file where a single sort leaves one unbounded") {
    // the layout claim behind q_zorder_layout, driven end-to-end: write
    // the same rows (a) range-partitioned + sorted by the interleaved
    // z-value and (b) by date alone, then audit every written file's
    // (price, date) bucket spans — the min/max rectangle IS what
    // footer stats prune on. The honest metric is the WORST dimension
    // span fraction, not the rectangle area: a 1/F z-range's bounding
    // box area can exceed the single-sort file's (tight date × full
    // price), but the single sort leaves price UNBOUNDED — a
    // price-only predicate prunes nothing — while z-order pays
    // ~sqrt on each axis and prunes on either.
    val interleave = (0 until 8).map { i =>
      s"((pb DIV ${1L << i}) % 2) * ${1L << (2 * i)} + ((db DIV ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val df = graft.Tables.orders(spark, sf001).selectExpr(
        "LEAST(CAST(FLOOR(o_totalprice) AS BIGINT) DIV 2500, 255) AS pb",
        s"LEAST(GREATEST((unix_seconds(CAST(o_orderdate AS TIMESTAMP)) - ${8035L * 86400}) DIV 864000, 0), 255) AS db")
      .withColumn("zval", expr(interleave))
    val base = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    df.repartitionByRange(16, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(s"$base/z")
    df.repartitionByRange(16, col("db")).sortWithinPartitions("db")
      .write.mode("overwrite").parquet(s"$base/lin")
    // global extents normalize the span fractions
    val ext = df.agg(
      (max("pb") - min("pb") + 1).as("pbe"), (max("db") - min("db") + 1).as("dbe")).head()
    val (pbe, dbe) = (ext.getAs[Long]("pbe").toDouble, ext.getAs[Long]("dbe").toDouble)
    def worstDimFraction(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("pb") - min("pb") + 1).as("pbs"), (max("db") - min("db") + 1).as("dbs"))
        .collect()
      assert(spans.length >= 8, s"expected several files under $path")
      def avg(xs: Seq[Double]) = xs.sum / xs.length
      math.max(avg(spans.map(_.getAs[Long]("pbs").toDouble)) / pbe,
               avg(spans.map(_.getAs[Long]("dbs").toDouble)) / dbe)
    }
    val (zWorst, linWorst) = (worstDimFraction(s"$base/z"), worstDimFraction(s"$base/lin"))
    // date-sorted files span ~the full price axis (worst ≈ 1); z files
    // must bound both axes well below that
    assert(linWorst > 0.8, s"fixture surprise: date-sort should leave price unbounded, got $linWorst")
    assert(zWorst < 0.6, s"z-order worst-dimension span $zWorst not bounded")
    assert(zWorst < linWorst,
      s"z-order worst-dim $zWorst not tighter than single-sort $linWorst")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}

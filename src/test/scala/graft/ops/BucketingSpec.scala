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
}

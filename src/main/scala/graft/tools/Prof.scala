package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{SparkDialect, SqlOps, StagedOp}

/** Dev utility: stage-by-stage timing of a StagedOp pipeline,
  * materializing every stage exactly as SparkEntry.sqlStaged does so
  * the body timing profiles the real query.
  *
  * Usage: runMain graft.tools.Prof [sfDir] [opName]
  * where opName ∈ jaccard | minhash | simhash_pairs | ivf | cosine | knn | lsh
  */
object Prof {
  val ops: Map[String, (String, StagedOp)] = Map(
    "jaccard" -> ("documents" -> SqlOps.dedupNgramJaccard),
    "minhash" -> ("documents" -> SqlOps.dedupMinhash),
    "simhash_pairs" -> ("documents" -> SqlOps.dedupSimhashPairs),
    "ivf" -> ("embeddings" -> SqlOps.annIvf),
    "cosine" -> ("embeddings" -> SqlOps.dedupEmbeddingCosine),
    "knn" -> ("embeddings" -> SqlOps.knnBruteForce),
    "lsh" -> ("embeddings" -> SqlOps.annSignLsh))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val (view, op) = ops(if (args.length > 1) args(1) else "jaccard")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.local(cpus)
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables(spark, sfDir, view).createOrReplaceTempView(view)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    // untimed warmup so JVM/codegen startup doesn't land on stage 1
    spark.sql(s"SELECT COUNT(*) FROM $view").count()
    val explain = sys.env.contains("PROF_EXPLAIN")
    op.stages.foreach { case (name, build) =>
      val path = s"/tmp/prof_stage/$name"
      val df = spark.sql(build(SparkDialect))
      if (explain) { println(s"==== stage $name plan ===="); df.explain("formatted") }
      timed(s"stage $name count")(df.count())
      timed(s"stage $name count2")(spark.sql(build(SparkDialect)).count())
      timed(s"stage $name write") {
        df.write.mode("overwrite").parquet(path); 0L
      }
      spark.read.parquet(path).createOrReplaceTempView(name)
    }
    val body = spark.sql(op.body(SparkDialect))
    timed("full body")(body.count())
    timed("full body again")(spark.sql(op.body(SparkDialect)).count())
    spark.stop()
  }
}

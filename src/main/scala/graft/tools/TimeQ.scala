package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries (2 runs each, after an
  * untimed warmup query) without running the whole Bench suite.
  *
  * Usage: runMain graft.tools.TimeQ <sfDir> <query> [<query> ...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.GraftSession.local(cpus, shuffle)
    try graft.SparkEntry.queries("q_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { run =>
        graft.ops.Cluster.resetRounds()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val rounds =
          if (graft.ops.Cluster.lastRounds >= 0) s" rounds=${graft.ops.Cluster.lastRounds}"
          else ""
        println(f"[timeq] $n%-28s run$run ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$rows$rounds")
      }
    }
    spark.stop()
  }
}

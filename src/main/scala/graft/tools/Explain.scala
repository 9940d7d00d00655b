package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev utility: print the formatted physical plan (and optionally time)
  * a registered query. Usage: runMain graft.tools.Explain <query> [sfDir] [time] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.local(cpus)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.length > 2 && args(2) == "time") {
      val t0 = System.nanoTime()
      println(s"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}

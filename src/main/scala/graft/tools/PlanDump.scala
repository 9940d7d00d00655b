package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev utility: dump formatted physical plans of selected queries to a
  * file (evidence for PLANS.md). Usage: runMain graft.tools.PlanDump <out> <q1> <q2> ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val names = args.drop(1)
    val spark = graft.GraftSession.local("8")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      sb.append(s"===== $n =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}

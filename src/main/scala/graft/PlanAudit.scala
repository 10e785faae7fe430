package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round dev tool: one compact plan-shape line per gate —
  * parquet-scan count, exchange count, reused-exchange count, join
  * strategies, plan size — so subtree duplication (scan count ≫ table
  * count) and join-strategy surprises are visible across the whole
  * inventory in one JVM, without executing anything.
  *
  * `runMain graft.PlanAudit [sfDir] [substringFilter]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val filt = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inventory = filt.map(f => Queries.all.filter(_.name.contains(f)))
      .getOrElse(Queries.all)
    def count(s: String, needle: String): Int =
      s.sliding(needle.length).count(_ == needle)
    inventory.foreach { q =>
      try {
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val planMs = (System.nanoTime() - t0) / 1e6
        println(f"${q.name}%-42s scans=${count(p, "Scan parquet")}%3d " +
          f"exch=${count(p, "Exchange")}%3d reuse=${count(p, "ReusedExchange")}%2d " +
          f"bnlj=${count(p, "BroadcastNestedLoopJoin")}%2d smj=${count(p, "SortMergeJoin")}%2d " +
          f"bhj=${count(p, "BroadcastHashJoin")}%2d cart=${count(p, "CartesianProduct")}%2d " +
          f"win=${count(p, "Window [")}%2d lines=${p.linesIterator.size}%5d planMs=$planMs%8.1f")
      } catch { case e: Throwable =>
        println(s"${q.name} ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}

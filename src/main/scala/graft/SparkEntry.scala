package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[Queries]]; this object just adapts it.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (Avoids the `events` table: its parquet INT64-nanos timestamps need
    * the nanosAsLong session flag that the driver's own session may not
    * set; Verify/Bench set it for the full inventory.)
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q02RoutesJoin.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}

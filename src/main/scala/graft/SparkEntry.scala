package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver-provided synthetic tables, with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All registered queries, grouped by the SURVEY.md §2 area they cover. */
  def allQueries: Seq[GraftQuery] = {
    val qs =
      TpchQueries.entries ++
        EventMetricsQueries.entries ++
        JoinQueries.entries ++
        SetOpQueries.entries ++
        EnrichQueries.entries ++
        ScalarQueries.entries ++
        DedupQueries.entries ++
        VectorQueries.entries ++
        TextQueries.entries ++
        ApiQueries.entries ++
        ReportQueries.entries ++
        PipelineQueries.entries
    // a duplicate name would silently vanish in the toMap below — the
    // driver would see "fewer queries", not a failure
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the landing-page metrics slice — filter → sessionize → COUNTER
    * aggregate (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("a7_counter_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.reports

import graft.operators.Sessionize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNTER/SUSHI report job (SURVEY.md §3.3, `metricsreporter.py`): per
  * (repository-node × month) usage aggregates — unique/total
  * investigations/requests over sessionized events with per-country splits —
  * assembled into one JSON report document per node×month.
  *
  * The reference runs this as an asyncio fan-out of per-DOI ES aggregations
  * (10 threads, `metricsreporter.py:311-506`); here the whole report set for
  * all nodes and months is ONE plan: sessionize → two-level aggregate →
  * struct/json assembly. No driver-side loops — report rows scale with
  * (nodes × months), not with events.
  */
object CounterReport {

  /** Synthetic node/country dim CONTENT (the driver tables carry no
    * nodeId/geo columns). These formulas generate the rows of the
    * materialized attribution dimension
    * ([[graft.api.IdentifierDim.nodeDim]]); query paths consume that dim
    * through a broadcast JOIN (J6, `metricsreporter.py:678-703`) — never
    * these expressions directly on the fact side. */
  val NodeNames: Seq[String] = Seq("urn:node:A", "urn:node:B", "urn:node:C",
    "urn:node:D", "urn:node:E")
  val Countries: Seq[String] = Seq("US", "DE", "FR", "BR", "JP", "IN", "GB",
    "CA", "AU", "NL")

  // pmod, not %: Spark % keeps the dividend's sign, so a negative id
  // would hit element_at index 0 (throws) or a negative index (silently
  // wraps from the array end — wrong attribution)
  def nodeOf(userId: Column): Column =
    element_at(lit(NodeNames.toArray), (pmod(userId, lit(5)) + 1).cast("int"))

  def countryOf(userId: Column): Column =
    element_at(lit(Countries.toArray), (pmod(userId, lit(10)) + 1).cast("int"))

  /** Flat per-(node, period, country) COUNTER metrics over sessionized
    * events. `nodeDim` is the (user_id, node_id, country) attribution
    * dimension, broadcast-joined after sessionization. `requestTypes`
    * mirrors the DATA formatType (`metricsreporter.py:141-308`). */
  def flatMetrics(events: DataFrame, nodeDim: DataFrame, gapSeconds: Long,
                  requestTypes: Seq[String]): DataFrame = {
    val sess = Sessionize.withSessionSeqAuto(events, col("user_id"), col("ts"),
      col("event_id"), gapSeconds)
      .withColumn("session_key",
        concat(col("user_id"), lit("#"), col("session_seq")))
    val enriched = sess
      .join(broadcast(nodeDim), Seq("user_id"))
      // unresolvable-geo rows are dropped from reports
      // (`metricsreporter.py:442-444` pops the "n/a" key)
      .filter(col("country") =!= "n/a")
    // ONE definition of the COUNTER aggregate (MetricsKernel.counterMetrics)
    graft.operators.MetricsKernel.counterMetrics(enriched,
      date_format(col("ts"), "yyyy-MM"), col("session_key"),
      col("event_type"), requestTypes,
      dims = Seq(col("node_id"), col("country")))
      .select(col("node_id"), col("period"), col("country"),
        col("unique_investigations"), col("total_investigations"),
        col("unique_requests"), col("total_requests"))
  }

  /** One JSON report document per node×month: header + per-country
    * performance array (the SUSHI shape, `metricsreporter.py:69-138`).
    * Country maps via sorted struct collection — the reference's
    * country-counts dicts (A7). */
  def sushiReports(flat: DataFrame, created: String): DataFrame =
    flat.groupBy(col("node_id"), col("period"))
      .agg(
        sum(col("total_investigations")).as("total_investigations"),
        sum(col("total_requests")).as("total_requests"),
        sort_array(collect_list(struct(
          col("country"),
          col("unique_investigations"),
          col("total_investigations").as("investigations"),
          col("unique_requests"),
          col("total_requests").as("requests")))).as("performance"))
      .select(col("node_id"), col("period"), to_json(struct(
        struct(
          lit("DSR").as("report_id"),
          lit(created).as("created"),
          col("node_id").as("created_by"),
          col("period").as("reporting_period")).as("report_header"),
        col("total_investigations"),
        col("total_requests"),
        col("performance"))).as("report_json"))

  /** Report sink (S11): JSON lines, gzipped when the report set is large
    * (reference gzips >2000 datasets, `metricsreporter.py:82-84`). */
  def writeReports(reports: DataFrame, outPath: String,
                   gzipThreshold: Long = 2000L): Unit = {
    // the report set is small (nodes × months) but its upstream is the
    // full sessionize+aggregate pipeline — persist so the codec-choosing
    // count() doesn't execute that pipeline twice
    val materialized = reports.select(col("report_json")).persist()
    try {
      val w = materialized.write.mode("overwrite")
      if (materialized.count() > gzipThreshold)
        w.option("compression", "gzip").text(outPath)
      else w.text(outPath)
    } finally materialized.unpersist()
  }
}

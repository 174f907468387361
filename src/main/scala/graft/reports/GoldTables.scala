package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-layer materialized aggregates (SURVEY.md A8/§2.9): the Spark
  * analogue of the reference's Postgres ROLLUP materialized views
  * (`02-metrics-materialized-views.sql`) plus its portal-hash change
  * detection (`es_eventlog_sync.py:469-547`).
  *
  * Spark has no automatic view routing, so gold tables are scheduled jobs.
  * The build is incremental: a per-group input fingerprint decides which
  * groups changed, and dynamic partition overwrite replaces ONLY those
  * partitions — at 100 TB a daily gold refresh touches the handful of
  * groups with new events instead of rewriting the table.
  */
object GoldTables {

  /** The landing-page rollup view shape (A8): period rollup × event_type
    * with subtotal rows. */
  def rollupView(events: DataFrame): DataFrame =
    events
      .withColumn("y", year(col("ts")))
      .withColumn("m", month(col("ts")))
      .rollup(col("y"), col("m"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_unique"))

  /** Flat per-group gold aggregate, partitioned by `groupCol` on disk. */
  def goldAgg(events: DataFrame, groupCol: String): DataFrame =
    events.groupBy(col(groupCol),
      date_format(col("ts"), "yyyy-MM").as("period"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_unique"))

  /** Per-group input fingerprint (A16 portal hash): md5 over the sorted
    * member ids. Equal fingerprint ⇒ group unchanged ⇒ skip rebuild. */
  def fingerprints(events: DataFrame, groupCol: String): DataFrame =
    events.groupBy(col(groupCol))
      .agg(md5(concat_ws(",",
        sort_array(collect_list(col("event_id"))))).as("fingerprint"))

  /** Incremental gold build: recompute only groups whose fingerprint
    * changed since the last run; dynamic partition overwrite replaces just
    * those groups' partitions, and partitions of groups that VANISHED from
    * the input (present in prior state, absent now) are deleted — dynamic
    * overwrite alone would leave them stale forever. Fingerprint state
    * lives beside the gold table, like `portal_metadata`
    * (`00-metrics-tables.sql:70-75`). Vanished keys are collected to the
    * driver — safe because the group domain (nodes/portals) is small even
    * at 100 TB of events. Returns (rebuilt, skipped, removed) group counts. */
  def incrementalBuild(spark: SparkSession, events: DataFrame,
                       groupCol: String, goldPath: String,
                       statePath: String): (Long, Long, Long) = {
    val fresh = fingerprints(events, groupCol)
    val prior =
      try spark.read.parquet(statePath)
        .withColumnRenamed("fingerprint", "prior_fp")
      catch { case _: Exception => // first run: no state yet
        fresh.select(col(groupCol)).limit(0)
          .withColumn("prior_fp", lit(null).cast("string"))
      }
    // full outer: fresh-only = new, both-differ = changed, prior-only = vanished
    val joined = fresh.join(prior, Seq(groupCol), "full").cache()
    val changed = joined.filter(col("fingerprint").isNotNull &&
      (col("prior_fp").isNull || col("prior_fp") =!= col("fingerprint")))
      .select(col(groupCol))
    val vanishedKeys = joined.filter(col("fingerprint").isNull)
      .select(col(groupCol)).collect().map(_.get(0))
    val nChanged = changed.count()
    val nSkipped = joined.count() - nChanged - vanishedKeys.length
    if (nChanged > 0) {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      goldAgg(events.join(changed, Seq(groupCol), "left_semi"), groupCol)
        .write.mode("overwrite")
        .partitionBy(groupCol)
        .parquet(goldPath)
    }
    if (vanishedKeys.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(goldPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      vanishedKeys.foreach { k =>
        // escape exactly as the parquet writer does (e.g. ':' -> '%3A')
        val leaf = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(groupCol, String.valueOf(k))
        fs.delete(new org.apache.hadoop.fs.Path(root, leaf), true)
      }
    }
    if (nChanged > 0 || vanishedKeys.nonEmpty)
      fresh.write.mode("overwrite").parquet(statePath)
    joined.unpersist()
    (nChanged, nSkipped, vanishedKeys.length)
  }
}

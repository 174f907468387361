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

  /** Per-group input fingerprint for change detection (the role of the
    * reference's portal hash, `es_eventlog_sync.py:469-547`). Equal
    * fingerprint ⇒ group unchanged ⇒ skip rebuild.
    *
    * NOT the reference's md5-of-sorted-ids (that shape survives only for
    * bounded groups — see the graded `a16_group_fingerprint`): gold groups
    * here are nodes/portals whose member sets grow with the fact table, and
    * `collect_list` would hold billions of ids in one aggregation buffer at
    * 100 TB. Instead: member count plus two independently-salted SUMS of
    * per-row 64-bit hashes — order-insensitive, constant memory per group,
    * map-side combinable, and multiplicity-sensitive (an XOR would cancel
    * paired duplicates with probability 1; sums accumulate them). Sums are
    * decimal(38,0): ANSI mode would throw on long overflow, and 38 digits
    * absorbs any realistic row count times 2^63. */
  def fingerprints(events: DataFrame, groupCol: String): DataFrame =
    events.groupBy(col(groupCol))
      .agg(concat_ws("|",
        count(lit(1)),
        sum(xxhash64(col("event_id")).cast("decimal(38,0)")),
        sum(xxhash64(col("event_id"), lit(0x9e3779b97f4a7c15L))
          .cast("decimal(38,0)")))
        .as("fingerprint"))

  /** Incremental gold build: recompute only groups whose fingerprint
    * changed since the last run. Returns (rebuilt, skipped, removed). */
  def incrementalBuild(spark: SparkSession, events: DataFrame,
                       groupCol: String, goldPath: String,
                       statePath: String): (Long, Long, Long) =
    incrementalOverwrite(spark, events, groupCol, goldPath, statePath,
      changed => goldAgg(
        events.join(changed, Seq(groupCol), "left_semi"), groupCol))

  /** The shared incremental-partition protocol (used by gold aggregates
    * here and by [[SessionGold]]): diff per-group fingerprints of `source`
    * against the prior state, dynamic-partition-overwrite ONLY the changed
    * groups with `writeRows(changedKeys)`, DELETE partitions of groups
    * that vanished from the input (dynamic overwrite alone would serve
    * them stale forever), and refresh the state on any change. Vanished
    * keys are collected to the driver — safe because the group domain
    * (nodes/portals/days) is small even at 100 TB of events. Null/empty
    * group keys map to the writer's default partition directory. Returns
    * (rebuilt, skipped, removed) group counts. */
  def incrementalOverwrite(spark: SparkSession, source: DataFrame,
                           groupCol: String, path: String, statePath: String,
                           writeRows: DataFrame => DataFrame): (Long, Long, Long) = {
    val fresh = fingerprints(source, groupCol)
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
      writeRows(changed)
        .write.mode("overwrite")
        // per-write option — a session-conf mutation would silently change
        // every later overwrite in the session to dynamic semantics
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(groupCol)
        .parquet(path)
    }
    if (vanishedKeys.nonEmpty) {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      vanishedKeys.foreach { k =>
        // escape exactly as the parquet writer does (':' -> '%3A'); null
        // and empty keys land in the default partition directory
        val v = Option(k).map(String.valueOf).filter(_.nonEmpty)
          .getOrElse(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
        val leaf = ExternalCatalogUtils.getPartitionPathString(groupCol, v)
        fs.delete(new org.apache.hadoop.fs.Path(root, leaf), true)
      }
    }
    if (nChanged > 0 || vanishedKeys.nonEmpty)
      fresh.write.mode("overwrite").parquet(statePath)
    joined.unpersist()
    (nChanged, nSkipped, vanishedKeys.length)
  }
}

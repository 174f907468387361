package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Design note for 100 TB: every loader returns a plain parquet scan so
  * Catalyst predicate pushdown / column pruning reach the file source; no
  * caching or collect here. The `events` fact table is the stand-in for the
  * reference's `eventlog-*` index (SURVEY.md §1.2) — at scale it would be
  * written partitioned by `year/month(ts)` so the mandatory date-range
  * filter (reference `metricselasticsearch.py:1115-1123`) prunes partitions.
  */
/** Typed event record — the ingest-validation edge (SURVEY §1.4/§7.1:
  * `Dataset[ReadEvent]` at the edge; `DataFrame` for aggregation plans). */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The events fact table. Stored with nanosecond parquet timestamps which
    * Spark 4 refuses to read natively; we read `ts` as nanos-since-epoch
    * (legacy long mode) and rebuild a microsecond TimestampType column —
    * identical to what DuckDB 1.x yields when it coerces TIMESTAMP_NS to
    * its microsecond TIMESTAMP, so oracle comparisons line up exactly.
    *
    * KNOWN SIDE EFFECT: `nanosAsLong` is a session-wide conf consulted at
    * both schema resolution and scan execution, so it cannot be scoped to
    * this one (lazy) read — after the first `events` call, any OTHER
    * TIMESTAMP_NS parquet source in the session would also surface as
    * long. No such source exists in this engine (every table loads through
    * this object and only `events` carries nanos); production ingest lands
    * through the bronze writer, which stores microseconds.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      // integer division — `/` would round-trip through double and lose
      // sub-µs precision on 1.7e18-scale nanos
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Typed edge: schema-validated events. `.as[Event]` fails analysis on
    * any column/type drift — the schema-on-write guarantee the reference
    * gets from its ES index template (`elastic_notes.rst:216-250`). */
  def eventsTyped(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[Event] = {
    import spark.implicits._
    events(spark, dir).as[Event]
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift regression guard for `Tables.events`.
  *
  * Round 7 post-mortem: the driver regenerated `events.parquet` from
  * nanosecond TIMESTAMP_NS to plain microsecond timestamps, and the loader —
  * pinned to the nanos layout — failed analysis for every events consumer
  * (60/148 correctness rows lost, 34 test failures, bench rc=1). This class
  * of breakage must fail in `sbt test`, not in the driver's artifacts: the
  * spec writes one fixture per historical on-disk layout and pins that the
  * loader yields a plain `TimestampType` column (never NTZ — `unix_micros`
  * and streaming watermarks reject it; never long) with identical values.
  */
class TablesSchemaSpec extends SparkSpec {

  // 2024-03-15T12:34:56.789Z, in micros — exercises sub-second precision
  private val micros = 1710505896789000L

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_events_fixture").toString

  private def loadAndCheck(dir: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    val got = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(micros))
    // the typed edge must also survive (it failed analysis in round 7)
    assert(Tables.eventsTyped(spark, dir).count() === 1L)
  }

  private val baseSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def row(ts: Any): Row = Row(ts, 1L, 7L, "read", 1.0, "{}")

  test("events loader: current-generation microsecond TIMESTAMP_NTZ parquet") {
    val dir = fixtureDir()
    val schema = StructType(StructField("ts", TimestampNTZType) +: baseSchema.fields.toSeq)
    val df = spark.createDataFrame(
      java.util.List.of(row(java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir)
  }

  test("events loader: instant-typed (TIMESTAMP with tz) parquet") {
    val dir = fixtureDir()
    val schema = StructType(StructField("ts", TimestampType) +: baseSchema.fields.toSeq)
    val df = spark.createDataFrame(
      java.util.List.of(row(Timestamp.from(java.time.Instant.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L) * 1000L)))), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir)
  }

  test("events loader: legacy nanos-as-long layout (round-4-era driver data)") {
    // Spark cannot WRITE parquet TIMESTAMP_NS, but under
    // `spark.sql.legacy.parquet.nanosAsLong=true` (which the loader sets)
    // a TIMESTAMP_NS column RESOLVES as LongType — exactly the shape a raw
    // INT64 nanos column has. Writing long nanos therefore drives the same
    // loader branch (`schema("ts") == LongType` → `ts DIV 1000`).
    val dir = fixtureDir()
    val schema = StructType(StructField("ts", LongType) +: baseSchema.fields.toSeq)
    val df = spark.createDataFrame(
      java.util.List.of(row(micros * 1000L)), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    loadAndCheck(dir)
  }
}

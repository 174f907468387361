package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => T}

  private val schema = T.StructType(Seq(
    T.StructField("user", T.StringType),
    T.StructField("ts", T.TimestampType),
    T.StructField("id", T.LongType)))

  private def df(rows: Seq[(String, Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (u, s, i) =>
        Row(u, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)), i)
      }.asJava, schema)

  private def seqs(rows: Seq[(String, Long, Long)]): Map[Long, Long] =
    Sessionize.withSessionSeq(df(rows), col("user"), col("ts"), col("id"), 3600L)
      .select(col("id"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("gap boundary: exactly 3600s stays in session, 3601s starts a new one") {
    val base = 1700000000L
    val res = seqs(Seq(
      ("u", base, 1L), ("u", base + 3600, 2L), // same session (<= gap)
      ("u", base + 3600 + 3601, 3L)))          // gap exceeded → new
    assert(res(1L) == 1L && res(2L) == 1L && res(3L) == 2L)
  }

  test("sessions are per-key independent") {
    val base = 1700000000L
    val res = seqs(Seq(
      ("a", base, 1L), ("b", base + 10, 2L),
      ("a", base + 7200, 3L), ("b", base + 20, 4L)))
    assert(res(1L) == 1L && res(3L) == 2L) // a: two sessions
    assert(res(2L) == 1L && res(4L) == 1L) // b: one session
  }

  test("property: session assignment is invariant under input permutation") {
    val rnd = new scala.util.Random(42)
    val base = 1700000000L
    for (_ <- 1 to 5) {
      val rows = Seq.tabulate(20)(i => ("u", base + rnd.nextLong(20000L), i.toLong))
      val expected = seqs(rows.sortBy(r => (r._2, r._3)))
      val shuffled = seqs(rnd.shuffle(rows))
      assert(shuffled == expected)
    }
  }

  test("property: number of sessions equals number of >gap jumps + 1") {
    val rnd = new scala.util.Random(7)
    val base = 1700000000L
    for (_ <- 1 to 5) {
      val offsets = Seq.fill(15)(rnd.nextLong(50000L)).distinct
      val sorted = offsets.sorted
      val jumps = sorted.zip(sorted.tail).count { case (a, b) => b - a > 3600 }
      val rows = offsets.zipWithIndex.map { case (off, i) => ("u", base + off, i.toLong) }
      assert(seqs(rows).values.max == jumps + 1)
    }
  }

  test("split-window sessionization matches the single-window result exactly") {
    // split = gap (tightest legal split → maximum boundary merges): the
    // hot-key variant must renumber to the identical global session_seq
    val events = Tables.events(spark, testDataDir).limit(5000)
    val plain = Sessionize.withSessionSeq(events,
      col("user_id"), col("ts"), col("event_id"), 3600L)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (split <- Seq(3600L, 7200L, 86400L)) {
      val viaSplit = Sessionize.withSessionSeqSplit(events,
        col("user_id"), col("ts"), col("event_id"), 3600L,
        splitSeconds = split)
        .select("event_id", "session_seq")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSplit == plain, s"splitSeconds=$split")
    }
    intercept[IllegalArgumentException] { // split below the gap is unsound
      Sessionize.withSessionSeqSplit(events, col("user_id"), col("ts"),
        col("event_id"), 3600L, splitSeconds = 60L)
    }
  }

  test("auto dispatch: graded session queries hash-identically via the split path") {
    // force the size threshold to 0 so withSessionSeqAuto takes the
    // bounded split plan, and assert the graded query shapes
    // (a4_session_rollup, a7/r_counter_flat) are row-for-row unchanged —
    // the hot-key-bounded posture must be a pure implementation detail
    def rows(name: String) = SparkEntry.queries(name)(spark, testDataDir)
      .collect().map(_.toString).sorted.toSeq
    val plain = Seq("a4_session_rollup", "r_counter_flat").map(q => q -> rows(q))
    spark.conf.set("graft.sessionize.splitAboveBytes", "0")
    try plain.foreach { case (q, expect) =>
      assert(rows(q) == expect, s"$q diverged via the split path")
    } finally spark.conf.unset("graft.sessionize.splitAboveBytes")
  }

  test("session ids are collision-stable under recomputation") {
    val base = 1700000000L
    val rows = Seq(("u", base, 1L), ("v", base, 2L), ("u", base + 9000, 3L))
    def ids(rs: Seq[(String, Long, Long)]) = Sessionize.withSessionId(
      Sessionize.withSessionSeq(df(rs), col("user"), col("ts"), col("id"), 3600L),
      col("user")).select("id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (ids1, ids2) = (ids(rows), ids(rows.reverse))
    assert(ids1 == ids2)
    assert(ids1(1L) != ids1(3L)) // different sessions → different ids
  }
}

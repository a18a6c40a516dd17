package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StreamOps, UserEvent}

/** Custom per-key state (flatMapGroupsWithState): session/event counts
  * must carry across micro-batches through the state store, and the
  * same transform must work on a batch Dataset. */
class StatefulSpec extends SparkSuite {

  private def t(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("state carries across micro-batches (session continuity)") {
    import spark.implicits._
    val mem = MemoryStream[UserEvent](spark)
    val q = StreamOps.userActivity(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("user_activity")
      .outputMode("update").start()
    try {
      // batch 1: user 1 has two events 10 min apart → 1 session
      mem.addData(UserEvent(1, t(0)), UserEvent(1, t(10)))
      q.processAllAvailable()
      // batch 2: 20 min after last → SAME session (state remembered);
      // then 100 min later → new session. user 2 appears fresh.
      mem.addData(UserEvent(1, t(30)), UserEvent(1, t(130)), UserEvent(2, t(0)))
      q.processAllAvailable()
      val rows = spark.table("user_activity")
        .groupBy("user_id").max("n_events", "n_sessions")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(rows(1L) == ((4L, 2L)),
        s"user 1: expected 4 events / 2 sessions, got ${rows(1L)}")
      assert(rows(2L) == ((1L, 1L)))
    } finally q.stop()
  }

  test("transformWithState (Spark 4 TWS) matches flatMapGroupsWithState") {
    import spark.implicits._
    // the TWS execution path is RocksDB-only
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val mem = MemoryStream[UserEvent](spark)
      val q = StreamOps.userActivityTws(mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("user_activity_tws")
        .outputMode("update").start()
      try {
        mem.addData(UserEvent(1, t(0)), UserEvent(1, t(10)))
        q.processAllAvailable()
        mem.addData(UserEvent(1, t(30)), UserEvent(1, t(130)), UserEvent(2, t(0)))
        q.processAllAvailable()
        val rows = spark.table("user_activity_tws")
          .groupBy("user_id").max("n_events", "n_sessions")
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        // identical to the flatMapGroupsWithState expectations above
        assert(rows(1L) == ((4L, 2L)), s"user 1 via TWS: got ${rows.get(1L)}")
        assert(rows(2L) == ((1L, 1L)))
      } finally q.stop()
    }
  }

  test("same transform works on a batch Dataset") {
    import spark.implicits._
    val batch = Seq(
      UserEvent(7, t(0)), UserEvent(7, t(10)), UserEvent(7, t(120)),
      UserEvent(8, t(5))).toDS()
    val out = StreamOps.userActivity(batch, gapMinutes = 30)
      .collect().map(a => a.user_id -> ((a.n_events, a.n_sessions))).toMap
    assert(out(7L) == ((3L, 2L)))
    assert(out(8L) == ((1L, 1L)))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming-execution semantics that SQL oracles can't express:
  * batch/stream parity of the shared transforms, session-gap boundary
  * behavior, watermark late-data drop, and stateful dedup
  * (SURVEY.md §5.2).
  */
case class Ev(event_id: Long, user_id: Long, event_type: String,
    ts: Timestamp, value: Double)
case class Purchase(purchase_id: Long, user_id: Long, pts: Timestamp)
case class Signup(signup_id: Long, s_user_id: Long, sts: Timestamp)

class StreamingSpec extends SparkSuite {

  private def t(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("tumbling agg: streaming result equals the batch transform") {
    import spark.implicits._
    val events = Seq(
      Ev(1, 1, "view", t(5), 1.0), Ev(2, 1, "view", t(20), 2.0),
      Ev(3, 2, "click", t(65), 3.0), Ev(4, 2, "view", t(70), 4.5),
      Ev(5, 1, "view", t(130), 0.5))
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode("complete").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_parity")
        .orderBy(col("event_type"), col("win_start")).collect()
      val batch = StreamOps.tumblingAgg(events.toDF())
        .orderBy(col("event_type"), col("win_start")).collect()
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.length == 4) // (view,0h) (click,1h) (view,1h) (view,2h)
    } finally q.stop()
  }

  test("sliding agg: streaming result equals batch; watermark evicts state") {
    import spark.implicits._
    val events = Seq(
      Ev(1, 1, "view", t(5), 1.0), Ev(2, 1, "view", t(20), 2.0),
      Ev(3, 2, "click", t(40), 3.0), Ev(4, 2, "view", t(70), 4.5))
    // parity: complete-mode streaming over MemoryStream == batch form
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.slidingAgg(mem.toDF())
      .writeStream.format("memory").queryName("sliding_parity")
      .outputMode("complete").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding_parity")
        .orderBy(col("win_start")).collect()
      val batch = StreamOps.slidingAgg(events.toDF())
        .orderBy(col("win_start")).collect()
      assert(streamed.toSeq == batch.toSeq)
      // each event lands in exactly 2 windows (slide divides width)
      assert(batch.map(_.getLong(1)).sum == 2L * events.length)
    } finally q.stop()

    // eviction: with a watermark, an advancing stream finalizes closed
    // sliding windows (append emits them) and a late row cannot reopen
    val mem2 = MemoryStream[Ev](spark)
    val q2 = StreamOps.slidingAggStream(mem2.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sliding_evict")
      .outputMode("append").start()
    try {
      mem2.addData(Ev(1, 1, "view", t(5), 1.0)) // windows [-30,30) [0,60)
      q2.processAllAvailable()
      mem2.addData(Ev(2, 1, "view", t(180), 1.0)) // watermark → 2:50
      q2.processAllAvailable()
      val closed = spark.table("sliding_evict").collect()
      assert(closed.length == 2, "both hour-0 sliding windows must finalize")
      assert(closed.map(_.getLong(1)).sum == 2)
      // behind-watermark event: its windows are gone — no new output row
      mem2.addData(Ev(3, 1, "view", t(10), 9.0))
      q2.processAllAvailable()
      assert(spark.table("sliding_evict").count() == closed.length,
        "late row must not re-open an evicted sliding window")
    } finally q2.stop()
  }

  test("stream-stream interval join: streaming result equals batch") {
    import spark.implicits._
    val purchases = Seq(
      Purchase(1, 1, t(90)), Purchase(2, 1, t(200)),
      Purchase(3, 2, t(60)), Purchase(4, 3, t(30)))
    val signups = Seq(
      Signup(10, 1, t(40)),  // within 1h of purchase 1 (90) only
      Signup(11, 1, t(199)), // within 1h of purchase 2
      Signup(12, 2, t(61)),  // AFTER purchase 3 -> no match
      Signup(13, 9, t(10)))  // different user -> no match
    val pMem = MemoryStream[Purchase](spark)
    val sMem = MemoryStream[Signup](spark)
    val q = StreamOps.intervalJoinStream(pMem.toDF(), sMem.toDF(), "2 hours")
      .writeStream.format("memory").queryName("ssjoin_parity")
      .outputMode("append").start()
    try {
      pMem.addData(purchases: _*)
      sMem.addData(signups: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = StreamOps.intervalJoin(purchases.toDF(), signups.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(batch == Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: null row emits only after watermark") {
    import spark.implicits._
    val pMem = MemoryStream[Purchase](spark)
    val sMem = MemoryStream[Signup](spark)
    val q = StreamOps.leftOuterIntervalJoinStream(pMem.toDF(), sMem.toDF(),
        "10 minutes")
      .writeStream.format("memory").queryName("ssjoin_louter")
      .outputMode("append").start()
    def rows(): Set[(Long, Long)] = spark.table("ssjoin_louter").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    try {
      // P1 matches S10; P4 (user 3) has no signup — outer row pending
      pMem.addData(Purchase(1, 1, t(90)), Purchase(4, 3, t(30)))
      sMem.addData(Signup(10, 1, t(40)))
      q.processAllAvailable()
      assert(rows() == Set((1L, 10L)),
        "unmatched purchase must NOT emit before the watermark passes its interval")
      // advance BOTH watermarks past P4's match interval (wm = 300-10m)
      pMem.addData(Purchase(99, 8, t(300)))
      sMem.addData(Signup(99, 9, t(300)))
      q.processAllAvailable()
      // outer rows surface on the trigger AFTER the watermark advances
      pMem.addData(Purchase(100, 8, t(310)))
      sMem.addData(Signup(100, 9, t(310)))
      q.processAllAvailable()
      assert(rows().contains((4L, -1L)),
        "watermark-finalized unmatched purchase must emit null-padded")
      // parity with the batch form on the finalized prefix
      val batch = StreamOps.leftOuterIntervalJoin(
          Seq(Purchase(1, 1, t(90)), Purchase(4, 3, t(30))).toDF(),
          Seq(Signup(10, 1, t(40))).toDF())
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(batch == Set((1L, 10L), (4L, -1L)))
      assert(batch.subsetOf(rows()))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join: orphans on both sides emit after watermark") {
    import spark.implicits._
    val pMem = MemoryStream[Purchase](spark)
    val sMem = MemoryStream[Signup](spark)
    val q = StreamOps.fullOuterIntervalJoinStream(pMem.toDF(), sMem.toDF(),
        "10 minutes")
      .writeStream.format("memory").queryName("ssjoin_fouter")
      .outputMode("append").start()
    def rows(): Set[(Long, Long)] = spark.table("ssjoin_fouter").collect()
      .map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)),
        (if (r.isNullAt(1)) -1L else r.getLong(1)))).toSet
    try {
      // P1 matches S10; P4 (user 3) and S12 (user 2 — no purchase) are
      // orphans on opposite sides. S12 sits at t(35) so the min-source
      // watermark (t(35) - 10m) stays BELOW P4's interval bound t(30)
      // until the late rows below advance it.
      pMem.addData(Purchase(1, 1, t(90)), Purchase(4, 3, t(30)))
      sMem.addData(Signup(10, 1, t(40)), Signup(12, 2, t(35)))
      q.processAllAvailable()
      assert(rows() == Set((1L, 10L)),
        "orphans must NOT emit before the watermark passes their intervals")
      // advance both watermarks, then one more trigger to flush
      pMem.addData(Purchase(99, 8, t(300)))
      sMem.addData(Signup(99, 9, t(300)))
      q.processAllAvailable()
      pMem.addData(Purchase(100, 8, t(310)))
      sMem.addData(Signup(100, 9, t(310)))
      q.processAllAvailable()
      assert(rows().contains((4L, -1L)),
        "unmatched purchase must emit null-padded")
      assert(rows().contains((-1L, 12L)),
        "unmatched signup must emit null-padded")
      // parity with the batch form on the finalized prefix
      val batch = StreamOps.fullOuterIntervalJoin(
          Seq(Purchase(1, 1, t(90)), Purchase(4, 3, t(30))).toDF(),
          Seq(Signup(10, 1, t(40)), Signup(12, 2, t(35))).toDF())
        .collect().map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)),
          (if (r.isNullAt(1)) -1L else r.getLong(1)))).toSet
      assert(batch == Set((1L, 10L), (4L, -1L), (-1L, 12L)))
      assert(batch.subsetOf(rows()))
    } finally q.stop()
  }

  test("stream-static join: streaming result equals batch") {
    import spark.implicits._
    val events = Seq(
      Ev(1, 1, "view", t(5), 1.0), Ev(2, 2, "view", t(10), 2.0),
      Ev(3, 1, "click", t(15), 3.0), Ev(4, 9, "view", t(20), 4.0))
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.staticEnrich(mem.toDF(), dim, "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.format("memory").queryName("ss_static_parity")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("ss_static_parity").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = StreamOps.staticEnrich(events.toDF(), dim, "c_custkey")
        .select(col("event_id"), col("c_mktsegment")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch)
      // user 9 has no dim row -> dropped by the inner join
      assert(batch == Set((1L, "SEG_A"), (2L, "SEG_B"), (3L, "SEG_A")))
    } finally q.stop()
  }

  test("stream-static anti join: streaming result equals batch") {
    import spark.implicits._
    val events = Seq(
      Ev(1, 1, "view", t(5), 1.0), Ev(2, 2, "view", t(10), 2.0),
      Ev(3, 3, "click", t(15), 3.0))
    val ref = Seq(Tuple1(2L)).toDF("c_custkey")
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.antiEnrich(mem.toDF(), ref, "c_custkey")
      .select(col("event_id"))
      .writeStream.format("memory").queryName("ss_anti_parity")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("ss_anti_parity").collect()
        .map(_.getLong(0)).toSet
      val batch = StreamOps.antiEnrich(events.toDF(), ref, "c_custkey")
        .select(col("event_id")).collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch == Set(1L, 3L), "user 2 must be filtered out")
    } finally q.stop()
  }

  test("stateful queries run on the RocksDB state store provider") {
    // production state backend: state lives off-heap/on-disk in RocksDB
    // instead of the in-memory HDFS-backed map — the setting a real
    // deployment flips for large keyed state
    import spark.implicits._
    withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val events = Seq(
        Ev(1, 1, "view", t(5), 1.0), Ev(2, 1, "view", t(20), 2.0),
        Ev(3, 2, "click", t(65), 3.0))
      val mem = MemoryStream[Ev](spark)
      val q = StreamOps.tumblingAgg(mem.toDF())
        .writeStream.format("memory").queryName("rocksdb_parity")
        .outputMode("complete").start()
      try {
        mem.addData(events: _*)
        q.processAllAvailable()
        val streamed = spark.table("rocksdb_parity")
          .orderBy(col("event_type"), col("win_start")).collect()
        val batch = StreamOps.tumblingAgg(events.toDF())
          .orderBy(col("event_type"), col("win_start")).collect()
        assert(streamed.toSeq == batch.toSeq)
        // the provider actually engaged for this query
        assert(q.lastProgress.stateOperators.nonEmpty)
      } finally q.stop()
    }
  }

  test("session window boundary: touching sessions merge, gap > 30min splits") {
    import spark.implicits._
    val exact = Seq(Ev(1, 1, "view", t(0), 0), Ev(2, 1, "view", t(30), 0))
    assert(StreamOps.sessionAgg(exact.toDF()).count() == 1,
      "gap == 30min merges (Spark merges touching session windows)")
    val over = Seq(Ev(1, 1, "view", t(0), 0), Ev(2, 1, "view", t(31), 0))
    assert(StreamOps.sessionAgg(over.toDF()).count() == 2,
      "gap > 30min must start a new session")
    // chained: each event <30min from the previous merges into one
    // session even when the total span exceeds the gap
    val chain = Seq(Ev(1, 1, "view", t(0), 0), Ev(2, 1, "view", t(25), 0),
      Ev(3, 1, "view", t(50), 0))
    val rows = StreamOps.sessionAgg(chain.toDF()).collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 3)
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.tumblingAggStream(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, 1, "view", t(5), 1.0))
      q.processAllAvailable()
      // advance event time far past hour 0: watermark = 3:00 - 10min
      mem.addData(Ev(2, 1, "view", t(180), 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("late_drop").count()
      assert(afterClose == 1, "hour-0 window should have been finalized")
      // this event's window (hour 0) is behind the watermark → dropped
      mem.addData(Ev(3, 1, "view", t(10), 99.0))
      q.processAllAvailable()
      val rows = spark.table("late_drop").collect()
      assert(rows.length == afterClose, "late row must not re-open the window")
      assert(rows.map(_.getLong(2)).sum == 1, "late row must not be counted")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by event_id across batches") {
    import spark.implicits._
    val mem = MemoryStream[Ev](spark)
    val q = StreamOps.dedupStream(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, 1, "view", t(5), 1.0), Ev(1, 1, "view", t(5), 1.0))
      q.processAllAvailable()
      mem.addData(Ev(1, 1, "view", t(6), 1.0), Ev(2, 1, "view", t(7), 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }
}

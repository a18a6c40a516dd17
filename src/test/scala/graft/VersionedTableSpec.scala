package graft

import java.io.File

import org.apache.hadoop.fs.Path

import graft.pipeline.VersionedTable

/** [[VersionedTable]] — atomic pointer publish, time travel, vacuum,
  * and the full crash matrix (every window self-heals because the
  * source of truth is "max version directory with _SUCCESS", the
  * pointer being only an optimization). */
class VersionedTableSpec extends SparkSuite {

  private val root = {
    val dir = new File("target/test-fixtures/versionedtable")
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir); dir.mkdirs()
    dir.getPath
  }

  private def df(xs: (Long, String)*) = {
    import spark.implicits._
    xs.toDF("k", "v")
  }

  private def readMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("publish/read/time-travel: each version is an immutable snapshot") {
    val t = s"$root/t1"
    assert(VersionedTable.read(spark, t).isEmpty)
    assert(VersionedTable.publish(df(1L -> "a"), t) === 1L)
    assert(VersionedTable.publish(df(1L -> "a2", 2L -> "b"), t) === 2L)
    assert(VersionedTable.publish(df(2L -> "b"), t) === 3L)
    assert(VersionedTable.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(readMap(VersionedTable.read(spark, t).get) === Map(2L -> "b"))
    assert(readMap(VersionedTable.readVersion(spark, t, 1)) === Map(1L -> "a"))
    assert(readMap(VersionedTable.readVersion(spark, t, 2)) ===
      Map(1L -> "a2", 2L -> "b"))
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, t, 99)
    }
  }

  test("crash matrix: incomplete version invisible; lagging pointer " +
      "heals; torn pointer falls back to max-complete") {
    val t = s"$root/t2"
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.publish(df(1L -> "a"), t)
    VersionedTable.publish(df(1L -> "b"), t)

    // window 1 — crash while writing version 3: dir exists, no _SUCCESS
    val v3 = new Path(s"$t/_v/000000000003")
    fs.mkdirs(v3)
    val junk = fs.create(new Path(v3, "part-00000.parquet"))
    junk.write(Array[Byte](9, 9)); junk.close()
    assert(VersionedTable.versions(spark, t) === Seq(1L, 2L))
    assert(readMap(VersionedTable.read(spark, t).get) === Map(1L -> "b"))
    // the retry overwrites the junk and commits
    assert(VersionedTable.publish(df(1L -> "c"), t) === 3L)
    assert(readMap(VersionedTable.read(spark, t).get) === Map(1L -> "c"))

    // window 2 — version 4 committed but pointer never advanced
    df(1L -> "d").write.mode("overwrite").parquet(s"$t/_v/000000000004")
    assert(readMap(VersionedTable.read(spark, t).get) === Map(1L -> "d"),
      "resolution must take max(pointer, max-complete)")
    // and the next publish lands ABOVE the unpointed version
    assert(VersionedTable.publish(df(1L -> "e"), t) === 5L)

    // window 3 — torn/garbage pointer: fall back to max-complete
    val out = fs.create(new Path(s"$t/_CURRENT"), true)
    out.write("garbage".getBytes); out.close()
    assert(readMap(VersionedTable.read(spark, t).get) === Map(1L -> "e"))
  }

  test("vacuum drops old versions only; the current one always survives") {
    val t = s"$root/t3"
    (1 to 5).foreach(i => VersionedTable.publish(df(i.toLong -> s"v$i"), t))
    assert(VersionedTable.vacuum(spark, t, keep = 2) === Seq(1L, 2L, 3L))
    assert(VersionedTable.versions(spark, t) === Seq(4L, 5L))
    assert(readMap(VersionedTable.read(spark, t).get) === Map(5L -> "v5"))
    assert(readMap(VersionedTable.readVersion(spark, t, 4)) === Map(4L -> "v4"))
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, t, 3)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.vacuum(spark, t, keep = 0)
    }
  }

  test("streaming upsert through the versioned table: every batch a " +
      "time-travelable snapshot; replay adds a value-equal version") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    val t = s"$root/t5"
    val mem = MemoryStream[Up](spark)
    def start() = StreamOps.upsertSinkVersioned(
        mem.toDF(), t, Seq("k"), "ver")
      .option("checkpointLocation", s"$root/t5-ck").start()
    def m(d: org.apache.spark.sql.DataFrame) =
      d.as[Up].collect().map(u => u.k -> ((u.ver, u.v))).toMap
    val q = start()
    try {
      mem.addData(Up(1, 1, "a"))
      q.processAllAvailable()
      mem.addData(Up(1, 2, "a2"), Up(2, 1, "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.versions(spark, t) === Seq(1L, 2L))
    assert(m(VersionedTable.readVersion(spark, t, 1)) ===
      Map(1L -> ((1L, "a"))))
    assert(m(VersionedTable.read(spark, t).get) ===
      Map(1L -> ((2L, "a2")), 2L -> ((1L, "b"))))
    // replay (at-least-once): same logical batch re-delivered after a
    // restart merges value-equal — one more version, identical bytes
    val q2 = start()
    try {
      mem.addData(Up(1, 2, "a2"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(VersionedTable.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(m(VersionedTable.readVersion(spark, t, 3)) ===
      m(VersionedTable.readVersion(spark, t, 2)))
  }

  test("a reader's resolved snapshot survives a concurrent publish " +
      "(snapshot isolation, the property the swap sink cannot give)") {
    val t = s"$root/t4"
    VersionedTable.publish(df(1L -> "old"), t)
    val snapshot = VersionedTable.read(spark, t).get // resolves v1
    VersionedTable.publish(df(1L -> "new"), t) // writer moves on
    // the old snapshot's files were never touched — the reader's
    // in-flight frame still scans v1 verbatim
    assert(readMap(snapshot) === Map(1L -> "old"))
    assert(readMap(VersionedTable.read(spark, t).get) === Map(1L -> "new"))
  }
}

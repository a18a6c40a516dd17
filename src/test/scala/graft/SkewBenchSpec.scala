package graft

import java.io.File

import org.apache.spark.sql.functions._

/** [[SkewBench]]'s skewed-corpus synthesis — the properties the
  * skew×scale artifact (tools/skewcurve_r16_k10.json) depends on,
  * machine-guarded like ScaleBenchSpec guards the volume synthesis:
  * the hot key absorbs EXACTLY the every-5th-row share (20%), total
  * volume and all other columns are untouched, and the same surgery
  * applied at k× keeps the hot share at 20% of the k× volume (so the
  * hot key's absolute population grows exactly k× — the growth the
  * worst-task measurement prices). */
class SkewBenchSpec extends SparkSuite {

  private val base = "/root/testdata/sf0.001"
  private val root = {
    val dir = new File("target/test-fixtures/skewbench")
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir); dir.mkdirs()
    dir.getPath
  }

  test("the hot user absorbs exactly the every-5th-event share; volume " +
      "and other columns are untouched") {
    ScaleBench.synthesize(spark, base, s"$root/x1", 1)
    SkewBench.skewify(spark, s"$root/x1", s"$root/xs1")
    val before = Tables.events(spark, s"$root/x1")
    val after = Tables.events(spark, s"$root/xs1")
    assert(after.count() === before.count(), "skew must not change volume")
    val expectHot = before.filter(col("event_id") % 5 === 0).count()
    assert(after.filter(col("user_id") === 77L).count() >= expectHot,
      "the hot user must hold at least the re-keyed share")
    assert(after.filter(col("event_id") % 5 === 0 && col("user_id") =!= 77L)
      .count() === 0L, "every 5th event must land on the hot user")
    // non-rekeyed rows keep their original user
    val joined = before.as("b").join(after.as("a"), Seq("event_id"))
      .filter(col("event_id") % 5 =!= 0)
    assert(joined.filter(col("b.user_id") =!= col("a.user_id")).count() === 0L)
  }

  test("the hot source absorbs exactly the every-5th-doc share with " +
      "text untouched") {
    ScaleBench.synthesize(spark, base, s"$root/x1", 1)
    SkewBench.skewify(spark, s"$root/x1", s"$root/xs1")
    val before = Tables.documents(spark, s"$root/x1")
    val after = Tables.documents(spark, s"$root/xs1")
    assert(after.count() === before.count())
    assert(after.filter(col("doc_id") % 5 === 0 &&
      col("source") =!= "hotsrc").count() === 0L)
    assert(after.filter(col("source") === "hotsrc").count()
      === before.filter(col("doc_id") % 5 === 0).count())
    val j = before.as("b").join(after.as("a"), Seq("doc_id"))
    assert(j.filter(col("b.text") =!= col("a.text")).count() === 0L,
      "skew must not touch document content")
  }

  test("at kx the hot key's population grows exactly kx (20% of the " +
      "kx volume)") {
    val k = 3
    ScaleBench.synthesize(spark, base, s"$root/x1", 1)
    ScaleBench.synthesize(spark, base, s"$root/x$k", k)
    SkewBench.skewify(spark, s"$root/x1", s"$root/xs1")
    SkewBench.skewify(spark, s"$root/x$k", s"$root/xs$k")
    def hot(dir: String): Long = Tables.events(spark, dir)
      .filter(col("user_id") === 77L).count()
    // key shifts are multiples of 5 (OffEvent = 10^7), so the every-
    // 5th-event share is residue-stable per copy and the hot
    // population scales exactly kx
    assert(hot(s"$root/xs$k") === k * hot(s"$root/xs1"),
      "hot-key population must grow exactly kx")
  }
}

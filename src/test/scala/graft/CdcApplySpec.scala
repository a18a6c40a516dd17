package graft

import org.apache.spark.sql.DataFrame

import graft.operators.CdcApply

/** [[CdcApply]] contract on hand-built op logs: last op wins, deletes
  * hide, re-inserts after a delete resurrect, and the cut is
  * deterministic. The registry query (q_cdc_apply) exercises the same
  * operator over the orders fixture with a DuckDB oracle. */
class CdcApplySpec extends SparkSuite {

  private def log(rows: (Long, Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "seq", "op", "v")
  }

  test("last op per key wins; deletes hide the key") {
    val out = CdcApply(log(
      (1L, 0L, "I", 10.0), (1L, 1L, "U", 11.0), (1L, 2L, "U", 12.0),
      (2L, 0L, "I", 20.0), (2L, 1L, "D", 0.0),
      (3L, 0L, "I", 30.0)), "k", "seq", "op")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(out === Map(1L -> 12.0, 3L -> 30.0))
  }

  test("re-insert after a delete resurrects the key with the new payload") {
    val out = CdcApply(log(
      (7L, 0L, "I", 1.0), (7L, 1L, "D", 0.0), (7L, 2L, "I", 99.0)),
      "k", "seq", "op")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(out === Map(7L -> 99.0))
  }

  test("an update to an unknown key surfaces as its own row (op-log is authoritative)") {
    // no base insert for key 5 — CDC apply materializes whatever the
    // log's final op says; filtering orphans is the caller's policy
    val out = CdcApply(log((5L, 3L, "U", 55.0)), "k", "seq", "op")
      .select("k", "v").collect()
    assert(out.length === 1 && out.head.getDouble(1) === 55.0)
  }

  test("result is invariant to input partitioning and row order") {
    import spark.implicits._
    val rows = (0L until 200L).flatMap { k =>
      Seq((k, 0L, "I", k * 1.0), (k, 1L, "U", k * 2.0)) ++
        (if (k % 3 == 0) Seq((k, 2L, "D", 0.0)) else Nil)
    }
    val a = CdcApply(rows.toDF("k", "seq", "op", "v").repartition(1),
      "k", "seq", "op").orderBy("k").collect()
    val b = CdcApply(
      rows.reverse.toDF("k", "seq", "op", "v").repartition(13),
      "k", "seq", "op").orderBy("k").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 200 - 67) // 67 keys divisible by 3 in [0, 200)
  }
}

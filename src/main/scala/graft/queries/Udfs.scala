package graft.queries

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** User-defined function surface (SURVEY.md §2-B "UDF / UDAF / UDTF").
  *
  * Built-ins beat UDFs (codegen) — these exist to prove the extension
  * points, and each pairs with an oracle expressing the identical
  * semantics in SQL:
  *  - scalar UDF: deterministic text normalization (NOT marked
  *    nondeterministic, so Catalyst may still push/dedup it);
  *  - typed UDAF: exact weighted mean via an [[Aggregator]] whose
  *    buffer is decimal-exact (order-independent merges — double
  *    accumulation would drift per partition order);
  *  - UDTF shape: char-3-gram shingle generator as a typed flatMap
  *    (a full Catalyst Generator is unnecessary — flatMap on a typed
  *    Dataset is the idiomatic Spark form).
  */
object Udfs extends QueryPack {

  /** UDAF buffer: exact decimal weighted sum + total weight. */
  case class WBuf(sumVW: BigDecimal, sumW: Long)

  /** Exact weighted mean: sum(value_dec * w) / sum(w), finished in one
    * double division. Buffer decimals keep partial merges exact. */
  val weightedMean: Aggregator[(Double, Long), WBuf, Double] =
    new Aggregator[(Double, Long), WBuf, Double] {
      override def zero: WBuf = WBuf(BigDecimal(0).setScale(2), 0L)
      override def reduce(b: WBuf, a: (Double, Long)): WBuf =
        WBuf(b.sumVW + BigDecimal(a._1).setScale(2, RoundingMode.HALF_UP) * a._2,
          b.sumW + a._2)
      override def merge(x: WBuf, y: WBuf): WBuf =
        WBuf(x.sumVW + y.sumVW, x.sumW + y.sumW)
      override def finish(b: WBuf): Double =
        if (b.sumW == 0L) Double.NaN else b.sumVW.toDouble / b.sumW
      override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  override def queries: Map[String, Query] = Map(
    // Scalar UDF: lower + trim + collapse runs of spaces.
    "q_udf_scalar" -> ((spark, sfDir) => {
      val normalize = udf((s: String) =>
        if (s == null) null else s.trim.toLowerCase.replaceAll(" +", " "))
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          substring(normalize(col("text")), 1, 40).as("norm_prefix"),
          length(normalize(col("text"))).cast("long").as("norm_len"))
        .orderBy(col("doc_id"))
    }),

    // Typed UDAF: mean of `value` weighted by the JSON `k` field.
    "q_udaf_typed" -> ((spark, sfDir) => {
      val wm = udaf(weightedMean)
      Tables.events(spark, sfDir)
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        // SQL SUM skips null weights; the tuple encoder's primitive
        // fields would instead crash on one — filter to match the
        // oracle exactly
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"))
        .agg(wm(col("value"), col("k")).as("wmean"))
        .orderBy(col("event_type"))
    }),

    // Generator/UDTF: char-3-gram shingles per doc via typed flatMap.
    "q_udtf_gen" -> ((spark, sfDir) => {
      val s = spark
      import s.implicits._
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 30)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) =>
          (0 to t.length - 3).map(i => (id, t.substring(i, i + 3)))
        }
        .toDF("doc_id", "shingle")
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle").asc)
        .limit(20)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT doc_id,
        |  substr(lower(trim(regexp_replace(text, ' +', ' ', 'g'))), 1, 40) AS norm_prefix,
        |  CAST(length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS BIGINT) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_udaf_typed" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * k) AS DOUBLE) / SUM(k) AS wmean
        |FROM (SELECT event_type, value,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_udtf_gen" ->
      """SELECT shingle, COUNT(*) AS n FROM (
        |  SELECT substr(text, CAST(i AS INT), 3) AS shingle FROM (
        |    SELECT text, unnest(range(1, length(text) - 1)) AS i
        |    FROM documents WHERE doc_id < 30))
        |GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 20""".stripMargin
  )
}

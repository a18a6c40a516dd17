package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity resolution / record linkage — the cross-table fuzzy-match
  * family member (SURVEY.md §2-B, round 12). The dedup family finds
  * near-copies WITHIN one corpus; record linkage matches INCOMING
  * dirty records against a clean MASTER table (the MDM / customer-360
  * shape): block on cheap exact keys, score candidates with an edit
  * metric, keep the best match per incoming record.
  *
  * Scale: the candidate join is a plain equi-join on the blocking key
  * (nation, name length) — per-record candidates are block-sized,
  * never table-sized, and the best-match cut is a row_number window
  * partitioned by the incoming id (groups = candidate lists, bounded
  * by block size). Production blocking would add more selective keys
  * (phonetic codes, name q-grams); the two-key block here keeps the
  * oracle SQL identical while demonstrating the shape. Levenshtein is
  * Spark's builtin and DuckDB's `levenshtein` — the same DP metric,
  * so the scores hash-match.
  *
  * The fixture's name space is adversarially dense (TPC-H names differ
  * only in digit positions, so Hamming-1 neighbors of a perturbed name
  * are common) — ties resolve to the min candidate id on both engines;
  * MatchingSpec plants a sparse fixture where the true source is the
  * unique nearest and asserts it always wins, plus blocking
  * completeness (a candidate outside the block never scores).
  */
object Matching extends QueryPack {

  /** Blocked best-match join. `incoming` columns: in_id, in_name, nk,
    * ln; `master` columns: m_id, m_name, m_nk (block = equal nation
    * key AND equal name length). Returns (in_id, m_id, dist) — the
    * lowest-distance candidate per incoming record, ties to the
    * lowest master id; incoming records whose block is empty are
    * absent (no-match is an explicit outcome, not a null row). */
  def bestMatch(incoming: DataFrame, master: DataFrame): DataFrame = {
    val cand = incoming.join(master,
        col("m_nk") === col("nk") && length(col("m_name")) === col("ln"))
      .select(col("in_id"), col("m_id"),
        levenshtein(col("in_name"), col("m_name")).cast("long").as("dist"))
    val w = Window.partitionBy(col("in_id"))
      .orderBy(col("dist"), col("m_id"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("in_id"), col("m_id"), col("dist"))
  }

  override def queries: Map[String, Query] = Map(
    // Incoming batch = every 3rd customer with digits corrupted by a
    // deterministic OCR-style confusion (0→O, 1→I, 2→Z, 3→E — length
    // preserving, so the length blocking key still holds). Match each
    // against the clean master by blocked levenshtein.
    "q_er_match" -> ((spark, sfDir) => {
      val cust = Tables.customer(spark, sfDir)
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("in_id"),
          translate(col("c_name"), "0123", "OIZE").as("in_name"),
          col("c_nationkey").as("nk"), length(col("c_name")).as("ln"))
      val master = cust.select(col("c_custkey").as("m_id"),
        col("c_name").as("m_name"), col("c_nationkey").as("m_nk"))
      bestMatch(dirty, master).orderBy(col("in_id"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "q_er_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS in_id,
        |    translate(c_name, '0123', 'OIZE') AS in_name,
        |    c_nationkey AS nk, length(c_name) AS ln
        |  FROM customer WHERE c_custkey % 3 = 0),
        |cand AS (
        |  SELECT d.in_id, c.c_custkey AS m_id,
        |    levenshtein(d.in_name, c.c_name) AS dist
        |  FROM dirty d JOIN customer c
        |    ON c.c_nationkey = d.nk AND length(c.c_name) = d.ln),
        |best AS (
        |  SELECT in_id, m_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY in_id ORDER BY dist, m_id) AS rn
        |  FROM cand)
        |SELECT in_id, m_id, dist FROM best WHERE rn = 1
        |ORDER BY in_id""".stripMargin)
}

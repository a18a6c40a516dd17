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
  * (nation, name length, plus an optional corruption-invariant
  * NORMALIZED-NAME key) — per-record candidates are block-sized,
  * never table-sized, and the best-match cut is a row_number window
  * partitioned by the incoming id (groups = candidate lists, bounded
  * by block size). Levenshtein is
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
    * absent (no-match is an explicit outcome, not a null row).
    *
    * `confusion` adds the SELECTIVE third blocking key production
    * record linkage needs (round-13, VERDICT r12 item 5): given the
    * OCR confusion alphabet as (corruptedChars, originalChars), both
    * sides' names normalize by the inverse translate — a
    * corruption-INVARIANT canonical form (any character the confusion
    * can produce maps back to its source; untouched characters map
    * identically on both sides) — and candidates must agree on it.
    * The two-key block scores every same-nation-same-length record
    * (the whole "Customer#########" population lands in one (nk, ln)
    * block — q_er_match was the registry's most expensive query at
    * 12 s steady); the normalized key cuts each candidate list to the
    * records that could BE this record under the declared noise
    * model, which is the blocking contract (Fellegi–Sunter blocking:
    * keys must be invariant under the corruption being resolved). */
  private def blockCond(confusion: Option[(String, String)]) =
    confusion match {
      case None => col("m_nk") === col("nk") && length(col("m_name")) === col("ln")
      case Some((corrupted, original)) =>
        col("m_nk") === col("nk") && length(col("m_name")) === col("ln") &&
          translate(col("m_name"), corrupted, original) ===
          translate(col("in_name"), corrupted, original)
    }

  def bestMatch(incoming: DataFrame, master: DataFrame,
      confusion: Option[(String, String)] = None): DataFrame = {
    val cand = incoming.join(master, blockCond(confusion))
      .select(col("in_id"), col("m_id"),
        levenshtein(col("in_name"), col("m_name")).cast("long").as("dist"))
    val w = Window.partitionBy(col("in_id"))
      .orderBy(col("dist"), col("m_id"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("in_id"), col("m_id"), col("dist"))
  }

  /** Blocking-quality report (round 13) — the two numbers every
    * blocking design is judged by (Fellegi–Sunter evaluation):
    * PAIR COMPLETENESS (does each incoming record's true source make
    * it into its candidate block? — here ground truth is in_id = m_id,
    * the fixture's construction) and REDUCTION RATIO (what fraction
    * of the |incoming| × |master| comparison space the blocking
    * eliminates). Run BEFORE committing to a blocking key at 100 TB:
    * completeness < 1 means the matcher cannot recover some sources
    * no matter how good the scorer; a low reduction ratio means the
    * block is a cross join in disguise. All-integer counts, two
    * double divisions at the end. */
  def blockingEval(incoming: DataFrame, master: DataFrame,
      confusion: Option[(String, String)] = None): DataFrame = {
    val stats = incoming.join(master, blockCond(confusion))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("in_id") === col("m_id"), 1L).otherwise(0L))
          .as("n_true_found"))
    val ni = incoming.agg(count(lit(1)).as("n_incoming"))
    val nm = master.agg(count(lit(1)).as("n_master"))
    stats.crossJoin(broadcast(ni)).crossJoin(broadcast(nm))
      .select(col("n_incoming"), col("n_master"), col("n_candidates"),
        (col("n_true_found").cast("double") /
          col("n_incoming").cast("double")).as("pair_completeness"),
        (lit(1.0) - col("n_candidates").cast("double") /
          (col("n_incoming").cast("double") * col("n_master").cast("double")))
          .as("reduction_ratio"))
  }

  override def queries: Map[String, Query] = Map(
    // Incoming batch = every 3rd customer with digits corrupted by a
    // deterministic OCR-style confusion (0→O, 1→I, 2→Z, 3→E — length
    // preserving, so the length blocking key still holds). Match each
    // against the clean master by blocked levenshtein; the block
    // includes the confusion-normalized name key (declared blocking
    // semantics, applied identically in the oracle SQL), which cuts
    // the per-record candidate list from the whole same-nation
    // same-length population to the records reachable under the noise
    // model — the selectivity production blocking keys exist for.
    "q_er_match" -> ((spark, sfDir) => {
      val cust = Tables.customer(spark, sfDir)
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("in_id"),
          translate(col("c_name"), "0123", "OIZE").as("in_name"),
          col("c_nationkey").as("nk"), length(col("c_name")).as("ln"))
      val master = cust.select(col("c_custkey").as("m_id"),
        col("c_name").as("m_name"), col("c_nationkey").as("m_nk"))
      bestMatch(dirty, master, confusion = Some(("OIZE", "0123")))
        .orderBy(col("in_id"))
    }),

    // Blocking-quality report over the SAME dirty/master fixture and
    // blocking keys as q_er_match — see [[blockingEval]].
    "q_er_blocking_eval" -> ((spark, sfDir) => {
      val cust = Tables.customer(spark, sfDir)
      val dirty = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("in_id"),
          translate(col("c_name"), "0123", "OIZE").as("in_name"),
          col("c_nationkey").as("nk"), length(col("c_name")).as("ln"))
      val master = cust.select(col("c_custkey").as("m_id"),
        col("c_name").as("m_name"), col("c_nationkey").as("m_nk"))
      blockingEval(dirty, master, confusion = Some(("OIZE", "0123")))
    }),

    // Golden-record survivorship (round 12): AFTER matching links a
    // cluster of records for the same real-world entity across
    // sources, survivorship builds the single golden record —
    // per FIELD, the value from the highest-priority source that has
    // one, with provenance. Fixture: three deterministic feeds of the
    // customer entity — web signups (prio 1, freshest balance
    // +10.00 exact decimal, no name), the CRM master (prio 2,
    // complete), an OCR batch (prio 3, corrupted names, no balance).
    // Shape: union → ONE key-partitioned window pass; per field,
    // FIRST_VALUE(... IGNORE NULLS) ordered by priority over the full
    // frame (explicit unbounded frame on BOTH engines — the default
    // ORDER BY frame stops at the current row), plus min-priority
    // provenance. One shuffle of the union at any source count;
    // priorities are unique per (key, source) so the order is total.
    // Balances ride DECIMAL(18,2) end-to-end (the +10 add is exact;
    // the final cast never downscales).
    "q_er_survivorship" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val bal2 = "decimal(18,2)"
      val web = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("key"), lit(1L).as("prio"),
          lit(null).cast("string").as("name"),
          (Tables.dec(col("c_acctbal")) + 10).cast(bal2).as("bal"),
          lit(null).cast("string").as("segment"))
      val crm = c.select(col("c_custkey").as("key"), lit(2L).as("prio"),
        col("c_name").as("name"),
        Tables.dec(col("c_acctbal")).cast(bal2).as("bal"),
        col("c_mktsegment").as("segment"))
      val ocr = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("key"), lit(3L).as("prio"),
          translate(col("c_name"), "0123", "OIZE").as("name"),
          lit(null).cast(bal2).as("bal"),
          lit(null).cast("string").as("segment"))
      val all = web.unionAll(crm).unionAll(ocr)
      val wf = Window.partitionBy(col("key")).orderBy(col("prio"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wo = Window.partitionBy(col("key")).orderBy(col("prio"))
      all
        .select(col("key"), col("prio"),
          first(col("name"), ignoreNulls = true).over(wf).as("name"),
          first(col("bal"), ignoreNulls = true).over(wf).as("bal"),
          first(col("segment"), ignoreNulls = true).over(wf).as("segment"),
          min(when(col("name").isNotNull, col("prio"))).over(wf)
            .as("name_src"),
          min(when(col("bal").isNotNull, col("prio"))).over(wf)
            .as("bal_src"),
          row_number().over(wo).as("rn"))
        .filter(col("rn") === 1)
        // bal leaves as DOUBLE: decimal OUTPUT columns are hash-unsafe
        // in the driver compare (EntrySpec gate); the survivorship
        // arithmetic itself stays DECIMAL end-to-end above, and a
        // 2-decimal value converts identically on both engines (the
        // q_join_inner price precedent)
        .select(col("key"), col("name"),
          col("bal").cast("double").as("bal"), col("segment"),
          col("name_src"), col("bal_src"))
        .orderBy(col("key"))
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
        |    ON c.c_nationkey = d.nk AND length(c.c_name) = d.ln
        |    AND translate(c.c_name, 'OIZE', '0123')
        |      = translate(d.in_name, 'OIZE', '0123')),
        |best AS (
        |  SELECT in_id, m_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY in_id ORDER BY dist, m_id) AS rn
        |  FROM cand)
        |SELECT in_id, m_id, dist FROM best WHERE rn = 1
        |ORDER BY in_id""".stripMargin,

    "q_er_blocking_eval" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS in_id,
        |    translate(c_name, '0123', 'OIZE') AS in_name,
        |    c_nationkey AS nk, length(c_name) AS ln
        |  FROM customer WHERE c_custkey % 3 = 0),
        |cand AS (
        |  SELECT d.in_id, c.c_custkey AS m_id
        |  FROM dirty d JOIN customer c
        |    ON c.c_nationkey = d.nk AND length(c.c_name) = d.ln
        |    AND translate(c.c_name, 'OIZE', '0123')
        |      = translate(d.in_name, 'OIZE', '0123')),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
        |    CAST(SUM(CASE WHEN in_id = m_id THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_true_found
        |  FROM cand),
        |ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_incoming FROM dirty),
        |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_master FROM customer)
        |SELECT n_incoming, n_master, n_candidates,
        |  CAST(n_true_found AS DOUBLE) / CAST(n_incoming AS DOUBLE)
        |    AS pair_completeness,
        |  1.0 - CAST(n_candidates AS DOUBLE)
        |    / (CAST(n_incoming AS DOUBLE) * CAST(n_master AS DOUBLE))
        |    AS reduction_ratio
        |FROM s, ni, nm""".stripMargin,

    "q_er_survivorship" ->
      """WITH web AS (
        |  SELECT c_custkey AS key, 1 AS prio,
        |    CAST(NULL AS VARCHAR) AS name,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 10
        |      AS DECIMAL(18,2)) AS bal,
        |    CAST(NULL AS VARCHAR) AS segment
        |  FROM customer WHERE c_custkey % 5 = 0),
        |crm AS (
        |  SELECT c_custkey AS key, 2 AS prio, c_name AS name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
        |    c_mktsegment AS segment
        |  FROM customer),
        |ocr AS (
        |  SELECT c_custkey AS key, 3 AS prio,
        |    translate(c_name, '0123', 'OIZE') AS name,
        |    CAST(NULL AS DECIMAL(18,2)) AS bal,
        |    CAST(NULL AS VARCHAR) AS segment
        |  FROM customer WHERE c_custkey % 3 = 0),
        |u AS (
        |  SELECT * FROM web UNION ALL SELECT * FROM crm
        |  UNION ALL SELECT * FROM ocr),
        |g AS (
        |  SELECT key, prio,
        |    FIRST_VALUE(name IGNORE NULLS) OVER (PARTITION BY key
        |      ORDER BY prio ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING) AS name,
        |    FIRST_VALUE(bal IGNORE NULLS) OVER (PARTITION BY key
        |      ORDER BY prio ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING) AS bal,
        |    FIRST_VALUE(segment IGNORE NULLS) OVER (PARTITION BY key
        |      ORDER BY prio ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING) AS segment,
        |    MIN(CASE WHEN name IS NOT NULL THEN prio END)
        |      OVER (PARTITION BY key) AS name_src,
        |    MIN(CASE WHEN bal IS NOT NULL THEN prio END)
        |      OVER (PARTITION BY key) AS bal_src,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY prio) AS rn
        |  FROM u)
        |SELECT key, name, CAST(bal AS DOUBLE) AS bal, segment,
        |  CAST(name_src AS BIGINT) AS name_src,
        |  CAST(bal_src AS BIGINT) AS bal_src
        |FROM g WHERE rn = 1 ORDER BY key""".stripMargin)
}

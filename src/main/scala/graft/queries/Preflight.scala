package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.GlobalRank

/** Shuffle pre-flight observability (round 12): the two reports an
  * engineer reads BEFORE keying a 100 TB shuffle — key-frequency skew
  * for a proposed partition key, and the exact join-cardinality
  * decomposition for a proposed join key. Both are cheap (one
  * aggregate pass over the key column, never the payload) and both
  * answer the question that decides the physical plan: does this key
  * need salting / AQE skew handling, and will this join explode?
  *
  * Reference scope: the reference pipeline keys its warehouse load by
  * tenant and date with no skew analysis (Unity_to_BigQuery.py:79-92);
  * these are the operators that make that choice safe at lake scale.
  */
object Preflight extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // Partition-key skew pre-flight: per-key frequency distribution of
    // a candidate shuffle key (events.user_id) collapsed to the
    // decision stats — key count, max/p99 frequency, the hottest key,
    // skew factor (max over mean), and the hottest key's row share.
    // Scale: ONE groupBy over the key column (map-side combinable);
    // the distinct-key frame is then ranked with the two-pass
    // GlobalRank (no single-task global window) for the exact-p99
    // readout, and the closes are 1-row broadcasts. Nothing here ever
    // touches a payload column, so the scan prunes to one column at
    // any corpus size. The p99 readout uses the q_agg_percentile_disc
    // rn = ceil(n·0.99) idiom — exact discrete percentile, no float
    // interpolation to disagree on.
    "q_part_skew_stats" -> ((spark, sfDir) => {
      val counts = Tables.events(spark, sfDir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val ranked = GlobalRank.withRowNumberAndCountPerGroup(
        counts, "rn", "nk", Seq.empty, col("c"), col("user_id"))
      val stats = ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_c"),
        max(when(col("rn") === ceil(col("nk") * 0.99), col("c"))).as("p99_c"))
      // hottest key with a min-key tiebreak (argmax ties are
      // engine-unspecified; a filter against the 1-row max is not)
      val top = counts
        .crossJoin(broadcast(stats.select(col("max_c").as("mx"))))
        .filter(col("c") === col("mx"))
        .agg(min(col("user_id")).as("top_key"))
      stats.crossJoin(broadcast(top))
        .select(col("n_keys"), col("n_rows"), col("max_c"), col("p99_c"),
          col("top_key"),
          (col("max_c").cast("double") * col("n_keys").cast("double")
            / col("n_rows").cast("double")).as("skew_factor"),
          (col("max_c").cast("double") / col("n_rows").cast("double"))
            .as("top_share"))
    }),

    // Join-cardinality pre-flight: the EXACT output size of
    // lineitem ⋈ orders on orderkey, decomposed per key — Σ_k cA(k)·cB(k)
    // — next to the textbook uniform estimate |A|·|B| / max(ndv_A,
    // ndv_B) and the single worst key's pair contribution. The gap
    // between exact and estimate IS the skew warning, and max_key_pairs
    // is the straggler bound a salting decision needs. Scale: two
    // key-column aggregates + one ndv-sized equi-join of count frames;
    // per-key products stay in int64 (a key contributing > 2^63 pairs
    // is a broken join, not a measurement problem). Payload columns
    // are never read.
    "q_join_cardinality" -> ((spark, sfDir) => {
      val ca = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_orderkey").as("key")).agg(count(lit(1)).as("ca"))
      val cb = Tables.orders(spark, sfDir)
        .groupBy(col("o_orderkey").as("key")).agg(count(lit(1)).as("cb"))
      val a = ca.agg(sum(col("ca")).as("rows_a"), count(lit(1)).as("ndv_a"))
      val b = cb.agg(sum(col("cb")).as("rows_b"), count(lit(1)).as("ndv_b"))
      val j = ca.join(cb, "key")
        .select((col("ca") * col("cb")).as("contrib"))
        .agg(sum(col("contrib")).as("exact_pairs"),
          max(col("contrib")).as("max_key_pairs"))
      a.crossJoin(broadcast(b)).crossJoin(broadcast(j))
        .select(col("rows_a"), col("ndv_a"), col("rows_b"), col("ndv_b"),
          col("exact_pairs"), col("max_key_pairs"),
          (col("rows_a").cast("double") * col("rows_b").cast("double")
            / greatest(col("ndv_a"), col("ndv_b")).cast("double"))
            .as("uniform_est"),
          (col("exact_pairs").cast("double") / col("rows_a").cast("double"))
            .as("amplification"))
    }),

    // Embedding-column health check: per-dimension n/mean/variance/
    // min/max plus a dead-dimension flag — the pre-flight an
    // embedding lake runs before ANN indexing or PQ training (a
    // near-constant dimension wastes a PQ subspace and distorts
    // nothing but storage; a wildly off-center one suggests a
    // normalization bug upstream). Scale: posexplode fans each vector
    // into dim-bounded (pos, v) rows whose partial sums map-side
    // combine into a 64-row stats frame — the q_sim_centroid shape.
    // Determinism: float sums run as round(v·1e7) integer DECIMAL
    // sums (every implicit float→decimal path differs across engines
    // — the centroid lesson); mean/variance close in one fixed double
    // chain; min/max of raw floats are order-independent.
    "q_embed_health" -> ((spark, sfDir) => {
      // DECIMAL(18,0) per element so the square still fits a decimal
      // product in BOTH engines' precision rules (sum widens to 38)
      val d180 = org.apache.spark.sql.types.DecimalType(18, 0)
      val sv = round(col("v").cast("double") * lit(1e7)).cast(d180)
      val mean = col("s1").cast("double") / lit(1e7) / col("n").cast("double")
      val variance = col("s2").cast("double") / lit(1e14) /
        col("n").cast("double") - mean * mean
      Tables.embeddings(spark, sfDir)
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n"), sum(sv).as("s1"),
          sum(sv * sv).as("s2"),
          min(col("v").cast("double")).as("minv"),
          max(col("v").cast("double")).as("maxv"))
        .select((col("pos") + 1).as("pos"), col("n"), mean.as("mean"),
          variance.as("variance"), col("minv"), col("maxv"),
          (variance < lit(1e-4)).as("dead"))
        .orderBy(col("pos"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_part_skew_stats" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
        |r AS (
        |  SELECT user_id, c,
        |    ROW_NUMBER() OVER (ORDER BY c, user_id) AS rn,
        |    COUNT(*) OVER () AS nk FROM c),
        |s AS (
        |  SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
        |    MAX(c) AS max_c,
        |    MAX(CASE WHEN rn = CEIL(nk * 0.99) THEN c END) AS p99_c
        |  FROM r),
        |t AS (
        |  SELECT MIN(user_id) AS top_key FROM c, s WHERE c.c = s.max_c)
        |SELECT n_keys, n_rows, max_c, p99_c, top_key,
        |  CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) AS skew_factor,
        |  CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top_share
        |FROM s CROSS JOIN t""".stripMargin,

    "q_join_cardinality" ->
      """WITH ca AS (
        |  SELECT l_orderkey AS key, COUNT(*) AS ca
        |  FROM lineitem GROUP BY l_orderkey),
        |cb AS (
        |  SELECT o_orderkey AS key, COUNT(*) AS cb
        |  FROM orders GROUP BY o_orderkey),
        |a AS (SELECT CAST(SUM(ca) AS BIGINT) AS rows_a,
        |        COUNT(*) AS ndv_a FROM ca),
        |b AS (SELECT CAST(SUM(cb) AS BIGINT) AS rows_b,
        |        COUNT(*) AS ndv_b FROM cb),
        |j AS (
        |  SELECT CAST(SUM(ca * cb) AS BIGINT) AS exact_pairs,
        |    MAX(ca * cb) AS max_key_pairs
        |  FROM ca JOIN cb USING (key))
        |SELECT rows_a, ndv_a, rows_b, ndv_b, exact_pairs, max_key_pairs,
        |  CAST(rows_a AS DOUBLE) * CAST(rows_b AS DOUBLE)
        |    / CAST(GREATEST(ndv_a, ndv_b) AS DOUBLE) AS uniform_est,
        |  CAST(exact_pairs AS DOUBLE) / CAST(rows_a AS DOUBLE)
        |    AS amplification
        |FROM a CROSS JOIN b CROSS JOIN j""".stripMargin,

    "q_embed_health" ->
      """WITH idx AS (
        |  SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings),
        |x AS (
        |  SELECT CAST(i AS INTEGER) AS pos,
        |    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e7)
        |      AS DECIMAL(18,0)) AS sv,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM idx),
        |s AS (
        |  SELECT pos, COUNT(*) AS n,
        |    CAST(SUM(sv) AS DECIMAL(38,0)) AS s1,
        |    CAST(SUM(sv * sv) AS DECIMAL(38,0)) AS s2,
        |    MIN(v) AS minv, MAX(v) AS maxv
        |  FROM x GROUP BY pos)
        |SELECT pos, n,
        |  CAST(s1 AS DOUBLE) / 1e7 / CAST(n AS DOUBLE) AS mean,
        |  CAST(s2 AS DOUBLE) / 1e14 / CAST(n AS DOUBLE)
        |    - (CAST(s1 AS DOUBLE) / 1e7 / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / 1e7 / CAST(n AS DOUBLE)) AS variance,
        |  minv, maxv,
        |  (CAST(s2 AS DOUBLE) / 1e14 / CAST(n AS DOUBLE)
        |    - (CAST(s1 AS DOUBLE) / 1e7 / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / 1e7 / CAST(n AS DOUBLE))) < 1e-4 AS dead
        |FROM s ORDER BY pos""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus curation utilities beyond dedup/quality (TextOps):
  * deterministic dataset splitting, temperature-based language
  * rebalancing, and phrase-vocabulary statistics.
  *
  * Scale notes (100 TB):
  *  - the split is a pure map-side projection + 3-group aggregate — no
  *    shuffle of note, reproducible on any cluster layout because the
  *    bucket is arithmetic on the key, not `rand()`;
  *  - temperature weights aggregate to one row per language (bounded)
  *    and close with exact sqrt/division — no FP-order drift;
  *  - bigram counting never shuffles raw tokens: pairs are formed
  *    map-side by zipping the token array against its own tail, so the
  *    only exchange is the partial-aggregated bigram counts.
  */
object Curation extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // Deterministic train/val/test split (90/5/5) — the reproducible
    // alternative to rand()-based splitting: bucket = Knuth
    // multiplicative hash of the stable doc key, identical on any
    // engine, any partitioning, any run. doc_id * 2654435761 stays
    // far under Long.MaxValue for any realistic id space (id < 3.4e9).
    "q_split_train_test" -> ((spark, sfDir) => {
      Tables.documents(spark, sfDir)
        .select(col("n_chars"),
          (col("doc_id") * lit(2654435761L) % 100).as("bucket"))
        .select(
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test").as("split"),
          col("n_chars"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy(col("split"))
    }),

    // Temperature-based multilingual rebalancing (alpha = 0.5): each
    // language's relative sampling rate vs the dominant language is
    // sqrt(n_l)/sqrt(n_max) — upsampling low-resource languages, as
    // multilingual-corpus training mixes do. sqrt and one division are
    // IEEE correctly-rounded on both engines (a pow()-based alpha would
    // not hash-compare; alpha = 0.5 keeps the math exact). The 1-row
    // max rides a broadcast cross join, never an unpartitioned window.
    "q_sample_temperature" -> ((spark, sfDir) => {
      val c = Tables.documents(spark, sfDir)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val m = c.agg(max(col("n")).as("mx"))
      c.crossJoin(broadcast(m))
        .select(col("lang"), col("n").as("n_docs"),
          (sqrt(col("n").cast("double")) / sqrt(col("mx").cast("double")))
            .as("rel_rate"))
        .orderBy(col("lang"))
    }),

    // Damped PageRank over the customer–supplier trade graph (who
    // buys from whom, via lineitem ⋈ orders): centrality of each
    // party in the commerce network. Node ids are namespaced
    // (customer = 2k, supplier = 2k+1) and the bipartite edge list is
    // SYMMETRIZED so no node dangles (see operators.PageRank). No
    // DuckDB oracle — 10 iterations of FP mat-vec are not reasonably
    // SQL-expressible — but the operator itself is bit-deterministic
    // (decimal contribution sums) and PageRankSpec pins known-graph
    // values, mass conservation, and partitioning-independence.
    "q_graph_pagerank" -> ((spark, sfDir) => {
      val pairs = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      graft.operators.PageRank(edges, iterations = 10)
        .orderBy(col("rank").desc, col("id").asc)
        .limit(20)
    }),

    // Deterministic global shuffle for training — the reproducible
    // answer to "randomize example order before sharding": shard =
    // Knuth hash of the stable key mod the shard count, position =
    // rank of the hash within the shard. One arithmetic map + ONE
    // shard-keyed exchange with in-partition sort (the window
    // partitions by shard, so shards sort independently — no global
    // sort). At 100 TB the shard count is the output-file count and
    // each sorted shard streams straight to its writer; identical
    // hash → identical order on any engine, partitioning, or rerun
    // (vs rand(), which is neither reproducible nor oracle-checkable).
    "q_shuffle_shards" -> ((spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val h = (col("doc_id") * lit(2654435761L)) % lit(4294967296L)
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), (h % 16).as("shard"), h.as("hv"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("hv"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Top-20 corpus bigrams with a total-order tiebreak. Pairs are
    // formed MAP-SIDE — zip the token array with its own tail and
    // explode once — so no doc-keyed window shuffle of raw tokens ever
    // happens; the single exchange carries partial bigram counts
    // (heavy hitters pre-combined per partition). The trailing
    // (last_token, null) zip element is the row to drop.
    "q_text_bigrams" -> ((spark, sfDir) => {
      Tables.documents(spark, sfDir)
        .select(split(col("text"), " ").as("ws"))
        .select(col("ws"), slice(col("ws"), lit(2), size(col("ws"))).as("tl"))
        .select(explode(arrays_zip(col("ws"), col("tl"))).as("p"))
        .filter(col("p.tl").isNotNull)
        .select(concat_ws(" ", col("p.ws"), col("p.tl")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_split_train_test" ->
      """WITH b AS (
        |  SELECT n_chars, (doc_id * 2654435761) % 100 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT CASE WHEN bucket < 90 THEN 'train'
        |              WHEN bucket < 95 THEN 'val'
        |              ELSE 'test' END AS split, n_chars
        |  FROM b)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT MAX(n) AS mx FROM c)
        |SELECT lang, n AS n_docs,
        |  SQRT(CAST(n AS DOUBLE)) / SQRT(CAST(mx AS DOUBLE)) AS rel_rate
        |FROM c CROSS JOIN m ORDER BY lang""".stripMargin,

    "q_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    (doc_id * 2654435761) % 4294967296 AS hv
        |  FROM documents)
        |SELECT doc_id, hv % 16 AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY hv % 16
        |    ORDER BY hv, doc_id) AS INTEGER) AS pos
        |FROM h
        |ORDER BY shard, pos""".stripMargin,

    "q_text_bigrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |z AS (
        |  SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
        |  FROM w)
        |SELECT p[1] || ' ' || p[2] AS bigram, COUNT(*) AS n
        |FROM z GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin
  )
}

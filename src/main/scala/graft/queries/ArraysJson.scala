package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Array / map / JSON operators (SURVEY.md §2-B "Array / map / JSON").
  *
  * The JSON rows encode the reference's schema-on-read payload
  * semantics: Unity export events are raw JSON forwarded as-is
  * (/root/reference/Unity_to_BigQuery.py:132,139-141), and the
  * `events.props` fixture column mirrors that blob.
  *
  * Determinism notes:
  *  - Never emit a raw array/map column (driver comparator limitation,
  *    SURVEY.md §7.4.5) — all outputs are scalars extracted from the
  *    collection.
  *  - Float folds: Spark's `aggregate(..., 0.0D, _+_)` is a sequential
  *    left fold; DuckDB `list_reduce` is the same fold without the
  *    initial 0.0 — but 0.0 + x == x exactly, so both produce
  *    bit-identical doubles. Elements are cast float→double (exact
  *    widening) before any arithmetic.
  *  - SUM(BIGINT) is HUGEINT in DuckDB vs LONG in Spark — cast the
  *    oracle side back to BIGINT.
  */
object ArraysJson extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_array_basic" -> ((spark, sfDir) => {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("arr_len"),
          element_at(col("embedding"), 1).as("first_val"),
          element_at(col("embedding"), -1).as("last_val"),
          element_at(slice(col("embedding"), 5, 10), 2).as("mid_val"))
        .orderBy(col("vec_id"))
    }),

    "q_array_hof" -> ((spark, sfDir) => {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")).as("sum_all"),
          element_at(transform(col("embedding"),
            x => x.cast("double") * 2), 3).as("x2_3"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")).as("sum_sq"))
        .orderBy(col("vec_id"))
    }),

    // Array → rows (the Generator/UDTF shape): tokenize + per-doc term
    // counts. explode is a Catalyst Generator — stays inside codegen.
    "q_explode" -> ((spark, sfDir) => {
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("token"))
    }),

    // NULL-PRESERVING generator (explode_outer): a parent row with an
    // EMPTY array survives with a null element instead of vanishing —
    // the left-join-like flattening an enrichment pipeline needs when
    // "no extracted items" is itself a fact. The rare-token filter
    // makes most arrays empty, so both behaviors are exercised; plain
    // explode would drop ~95% of the docs here (asserted by the
    // n_rows ≥ n_docs shape of the oracle).
    "q_explode_outer" -> ((spark, sfDir) => {
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "),
            t => t === lit("dup"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("token"))
    }),

    // Build a per-user map(event_type -> count), read scalars back out.
    "q_map_funcs" -> ((spark, sfDir) => {
      Tables.events(spark, sfDir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          coalesce(element_at(col("m"), "error"), lit(0L)).as("n_error"),
          size(col("m")).cast("long").as("n_types"))
        .orderBy(col("user_id"))
    }),

    // VARIANT (Spark 4): semi-structured values parse ONCE into the
    // binary variant encoding and field access is a typed path read —
    // the modern replacement for per-access get_json_object re-parsing.
    // A nested doc (object + array) is built deterministically from
    // event columns, parsed to variant, and read back with typed
    // variant_get paths; the oracle does the same reads with DuckDB's
    // JSON type. Output is scalar longs/strings (the variant stays
    // internal — binary encodings are engine-specific).
    "q_variant_json" -> ((spark, sfDir) => {
      val j = concat(
        lit("{\"id\":"), col("event_id"),
        lit(",\"meta\":{\"ty\":\""), col("event_type"),
        lit("\",\"k\":"), get_json_object(col("props"), "$.k"),
        lit("},\"tags\":[\"x\",\""), col("event_type"), lit("\"]}"))
      Tables.events(spark, sfDir)
        .select(parse_json(j).as("v"))
        .select(
          variant_get(col("v"), "$.id", "bigint").as("id"),
          variant_get(col("v"), "$.meta.ty", "string").as("ty"),
          variant_get(col("v"), "$.meta.k", "bigint").as("k"),
          variant_get(col("v"), "$.tags[1]", "string").as("tag1"))
        .groupBy(col("ty"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("id")).as("min_id"),
          count(when(col("ty") === col("tag1"), 1)).as("n_tag_match"))
        .orderBy(col("ty"))
    }),

    "q_json_extract" -> ((spark, sfDir) => {
      Tables.events(spark, sfDir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy(col("event_type"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_array_basic" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS arr_len,
        |  embedding[1] AS first_val,
        |  embedding[-1] AS last_val,
        |  embedding[6] AS mid_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_array_hof" ->
      """SELECT vec_id,
        |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    (a, b) -> a + b) AS sum_all,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[3] AS x2_3,
        |  list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS sum_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_explode" ->
      """SELECT doc_id, token, COUNT(*) AS n FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 20)
        |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin,

    "q_explode_outer" ->
      """SELECT doc_id, token, COUNT(*) AS n FROM (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS token
        |  FROM (
        |    SELECT doc_id,
        |      list_filter(string_split(text, ' '), t -> t = 'dup') AS l
        |    FROM documents))
        |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin,

    "q_map_funcs" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_variant_json" ->
      """WITH j AS (
        |  SELECT ('{"id":' || event_id || ',"meta":{"ty":"' || event_type ||
        |          '","k":' || json_extract_string(props, '$.k') ||
        |          '},"tags":["x","' || event_type || '"]}')::JSON AS v
        |  FROM events),
        |x AS (
        |  SELECT CAST(json_extract(v, '$.id') AS BIGINT) AS id,
        |    json_extract_string(v, '$.meta.ty') AS ty,
        |    CAST(json_extract(v, '$.meta.k') AS BIGINT) AS k,
        |    json_extract_string(v, '$.tags[1]') AS tag1
        |  FROM j)
        |SELECT ty, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(id) AS min_id,
        |  COUNT(*) FILTER (WHERE ty = tag1) AS n_tag_match
        |FROM x GROUP BY ty ORDER BY ty""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  COUNT(k) AS n_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One category of SURVEY.md §2-B operators.
  *
  * `queries` maps operator id → (session, sfDir) → result DataFrame;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare gate
  * (omitted for non-SQL-expressible operators, which instead carry
  * ScalaTest/property coverage). Column names/aliases MUST match between
  * the two sides — the driver sorts columns by name before hashing.
  */
trait QueryPack {
  type Query = (SparkSession, String) => DataFrame
  def queries: Map[String, Query]
  def oracleSql: Map[String, String]

  /** Scratch directory for queries that write an artifact (sinks,
    * persisted model tables, dedup indexes) and read it back —
    * namespaced per scale factor so sf runs never cross-contaminate. */
  protected def fixtureDir(sfDir: String, name: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/repo/target/fixtures")
    s"$root/${new java.io.File(sfDir).getName}/$name"
  }
}

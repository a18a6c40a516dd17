package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table support: pre-shuffle both sides of a recurring join
  * ONCE at write time so every subsequent join on the bucket key
  * co-locates with NO exchange — the highest-leverage shuffle
  * elimination at 100 TB (a nightly fact/dim join re-shuffles
  * terabytes every run; bucketed tables never do).
  *
  * Requirements for exchange-free joins (asserted in BucketingSpec):
  * identical bucket counts on both sides, join keys = bucket keys, and
  * `sortBy` on the key so SortMergeJoin skips its sort too.
  */
object Bucketing {

  /** `path`: external table location; default is the session warehouse
    * dir. One write recipe for every bucketed sink (BucketingSpec's
    * zero-Exchange assertion covers exactly this path). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}

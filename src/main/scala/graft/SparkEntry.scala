package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.ops.Queries; each has a DuckDB oracle unless
  * structurally non-SQL-expressible (minhash/simhash signatures, LSH
  * buckets, codec plans), which fall back to the rows-only check.
  */
object SparkEntry {

  /** Flagship: full encode → decode roundtrip of the documents table
    * through the codec pipeline, emitting per-row sha256 (driver
    * smoke-checks rows > 0 on sf0.001).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Queries.corpusRoundtripSha(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ops.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = ops.Queries.oracle
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries without an oracle get a weaker
  * rows-only check from the driver.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Helper: register parquet tables of `sfDir` as temp views so query
    * bodies can use spark.sql with the same table names the DuckDB
    * oracle sees.
    */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}

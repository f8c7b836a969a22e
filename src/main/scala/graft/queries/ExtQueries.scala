package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star extension query surface (dedup, similarity search, text
  * analysis, multimodal) — filled by graft.ops.{Dedup,Similarity,Text,
  * Multimodal}. Queries without a DuckDB-expressible oracle are present in
  * `queries` only (driver records a rows-only check).
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}

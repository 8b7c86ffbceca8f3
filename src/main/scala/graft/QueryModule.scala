package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One §2 category = one module. `queries` keys are the SURVEY.md §2
  * contract names; `oracles` carries the DuckDB twin for every
  * SQL-expressible query (omitted ⇒ driver records rows-only check). */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One verifiable unit of the engine: a named DataFrame plan over the
    * driver tables plus (when SQL-expressible) the equivalent DuckDB oracle
    * SQL. Column names/types must line up exactly — the driver sorts columns
    * by name before hashing values.
    */
  case class GraftQuery(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])
}

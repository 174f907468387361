package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal `field:value` boolean query compiler — the engine's analogue of
  * the reference's `interpretAs: "query"` collection queries (Solr
  * collectionQuery strings forwarded for portals, `metricsreader.py:151-156`,
  * `pid_resolution.py:458-488`).
  *
  * Grammar (whitespace-separated):
  * {{{
  *   expr   := clause (("AND" | "OR") clause)*
  *   clause := ["-"] field ":" value      // '-' negates, value may be *suffix*
  * }}}
  * AND binds tighter than OR (Lucene-ish). Values with a trailing `*` match
  * by prefix. The result is one Catalyst boolean Column — the whole filter
  * stays inside codegen and can push down when the field is a plain column.
  */
object QueryStringFilter {

  def compile(q: String): Column = {
    val orGroups = splitTop(q.trim, "OR")
    orGroups.map { g =>
      splitTop(g.trim, "AND").map(clause).reduce(_ && _)
    }.reduce(_ || _)
  }

  private def splitTop(s: String, op: String): Seq[String] =
    s.split(s"\\s+$op\\s+").toSeq

  private def clause(c: String): Column = {
    val trimmed = c.trim
    val (neg, body) =
      if (trimmed.startsWith("-")) (true, trimmed.drop(1)) else (false, trimmed)
    val Array(field, value) = body.split(":", 2)
    val base =
      if (value.endsWith("*")) col(field).startsWith(value.dropRight(1))
      else col(field) === value
    if (neg) !base else base
  }
}

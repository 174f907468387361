package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `field:value` boolean query compiler — the engine's analogue of the
  * reference's `interpretAs: "query"` collection queries (Solr
  * collectionQuery strings forwarded for portals, `metricsreader.py:151-156`,
  * `pid_resolution.py:458-488`; real stored queries look like
  * `-obsoletedBy:* AND (...)`, `es_eventlog_sync.py:239`).
  *
  * Grammar:
  * {{{
  *   expr   := term ("OR" term)*
  *   term   := factor ("AND" factor)*
  *   factor := ["-"] ( "(" expr ")" | clause )
  *   clause := field ":" value
  *   value  := '"' phrase '"' | word | word "*" | "*"
  * }}}
  * AND binds tighter than OR (Lucene-ish); parentheses group. `field:*`
  * tests existence (isNotNull). A trailing `*` on a bare word matches by
  * prefix; quoted phrases match exactly (spaces allowed); a backslash
  * escapes the next character (Lucene's `field:a\ b` spaces-in-value
  * form). Negation is null-safe, matching Lucene's `-field:v` (missing
  * fields match). The result is one Catalyst boolean Column — the whole
  * filter stays inside codegen and pushes down when fields are plain
  * columns.
  */
object QueryStringFilter {

  def compile(q: String): Column = {
    val (c, rest) = parseExpr(tokenize(q))
    require(rest.isEmpty, s"unparsed trailing tokens: ${rest.mkString(" ")}")
    c
  }

  private def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var inQuote = false
    var escaped = false
    def flush(): Unit = if (sb.nonEmpty) { out += sb.toString; sb.clear() }
    s.foreach {
      // keep the backslash IN the token: clause() must still see which
      // characters were escaped (a literal '*' vs the wildcard, a literal
      // '"' vs phrase syntax) and unescapes after deciding semantics
      case ch if escaped => sb.append('\\').append(ch); escaped = false
      case '\\' => escaped = true
      case ch if inQuote => sb.append(ch); if (ch == '"') inQuote = false
      case '"' => sb.append('"'); inQuote = true
      case ch @ ('(' | ')') => flush(); out += ch.toString
      case ch if ch.isWhitespace => flush()
      case ch => sb.append(ch)
    }
    require(!inQuote && !escaped, s"unterminated quote or escape in query: $s")
    flush()
    out.toList
  }

  private def parseExpr(ts: List[String]): (Column, List[String]) = {
    var (acc, rest) = parseTerm(ts)
    while (rest.headOption.contains("OR")) {
      val (nxt, r2) = parseTerm(rest.tail)
      acc = acc || nxt; rest = r2
    }
    (acc, rest)
  }

  private def parseTerm(ts: List[String]): (Column, List[String]) = {
    var (acc, rest) = parseFactor(ts)
    while (rest.headOption.contains("AND")) {
      val (nxt, r2) = parseFactor(rest.tail)
      acc = acc && nxt; rest = r2
    }
    (acc, rest)
  }

  private def parseFactor(ts: List[String]): (Column, List[String]) = ts match {
    case "-" :: rest => // negation split from a following group: -( ... )
      val (c, r2) = parseFactor(rest)
      (negate(c), r2)
    case "(" :: rest =>
      val (c, r2) = parseExpr(rest)
      require(r2.headOption.contains(")"), "missing closing parenthesis")
      (c, r2.tail)
    case tok :: rest if tok.startsWith("-") => (negate(clause(tok.drop(1))), rest)
    case tok :: rest => (clause(tok), rest)
    case Nil => throw new IllegalArgumentException("empty query")
  }

  /** Lucene-style negation: missing (null) fields MATCH a negated clause. */
  private def negate(c: Column): Column = !coalesce(c, lit(false))

  /** Strip escape backslashes (after wildcard/phrase decisions). */
  private def unescape(s: String): String =
    s.replaceAll("\\\\(.)", "$1")

  private def clause(body: String): Column = {
    val Array(field, value) = body.split(":", 2)
    val endsWithWildcard = // a '*' that was NOT written as '\*'
      value.endsWith("*") && !value.endsWith("\\*")
    if (value == "*") col(field).isNotNull // existence test
    else if (value.startsWith("\"") && value.endsWith("\"") && value.length >= 2)
      col(field) === unescape(value.substring(1, value.length - 1))
    else if (endsWithWildcard)
      col(field).startsWith(unescape(value.dropRight(1)))
    else col(field) === unescape(value)
  }
}

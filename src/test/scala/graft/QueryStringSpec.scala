package graft

import graft.api.QueryStringFilter
import org.apache.spark.sql.functions._

class QueryStringSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("view", "a1"), ("click", "a2"), ("view", "b1"), ("error", "a3"))
    .toDF("event_type", "tag")

  private def ids(q: String): Set[String] =
    df.filter(QueryStringFilter.compile(q)).select("tag")
      .collect().map(_.getString(0)).toSet

  test("single clause") {
    assert(ids("event_type:view") == Set("a1", "b1"))
  }

  test("AND binds tighter than OR") {
    assert(ids("event_type:error OR event_type:view AND tag:a1") ==
      Set("a3", "a1"))
  }

  test("prefix wildcard and negation") {
    assert(ids("tag:a*") == Set("a1", "a2", "a3"))
    assert(ids("-event_type:view AND tag:a*") == Set("a2", "a3"))
  }

  test("parentheses override precedence") {
    assert(ids("(event_type:error OR event_type:view) AND tag:a*") ==
      Set("a3", "a1"))
    assert(ids("-(event_type:view OR event_type:click)") == Set("a3"))
  }

  test("existence wildcard and null-safe negation (Lucene semantics)") {
    val withNulls = Seq(("view", "x1"), (null, "x2"), ("click", null))
      .toDF("event_type", "tag")
    def q(s: String) = withNulls.filter(QueryStringFilter.compile(s))
      .select("tag").collect().map(r => Option(r.getString(0))).toSet
    // the reference's stored queries start `-obsoletedBy:* AND ...`
    assert(q("-event_type:*") == Set(Some("x2"))) // field missing
    assert(q("event_type:*") == Set(Some("x1"), None)) // field present
    assert(q("-event_type:view") == Set(Some("x2"), None)) // null matches -f:v
  }

  test("escaped metacharacters stay literal: \\* is not a wildcard") {
    val vals = Seq(("10*", "m1"), ("105", "m2"), ("\"x\"", "m3"), ("x", "m4"))
      .toDF("f", "tag")
    def q(s: String) = vals.filter(QueryStringFilter.compile(s))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(q("""f:10\*""") == Set("m1")) // literal star, not prefix
    assert(q("f:10*") == Set("m1", "m2")) // unescaped star: prefix
    assert(q("""f:\"x\"""") == Set("m3")) // literal quotes, not phrase
    assert(q("f:\"x\"") == Set("m4")) // phrase: quotes stripped
  }

  test("backslash escapes spaces inside values (Lucene form)") {
    val js = Seq(("""{"k": 12}""", "j1"), ("""{"k": 7}""", "j2"))
      .toDF("props", "tag")
    val got = js.filter(
      QueryStringFilter.compile("""props:{"k":\ 1*"""))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == Set("j1"))
  }

  test("quoted phrases match exactly, spaces included") {
    val phrased = Seq(("deep sea data", "p1"), ("deep", "p2"))
      .toDF("title", "tag")
    val got = phrased.filter(
      QueryStringFilter.compile("title:\"deep sea data\""))
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == Set("p1"))
    intercept[IllegalArgumentException] {
      QueryStringFilter.compile("title:\"unterminated")
    }
    intercept[IllegalArgumentException] {
      QueryStringFilter.compile("(event_type:view")
    }
  }
}

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
}

package graft

import graft.sources.{CitationHarvest, CitationStaging}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** S10 connector replay against CANNED wire fixtures — real Crossref
  * event-data scholix and Crossref/DataCite works response shapes
  * (src/test/resources/graft/fixtures), no network. Exercises the edges
  * the orders-derived graded entry keeps regular: missing optional works
  * fields, the author name/literal/empty fallbacks, an untracked target,
  * case-insensitive DOI matching, and a source with no works body at all.
  */
class HarvestSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/graft/fixtures/$name")
    assert(url != null, s"fixture $name missing from test resources")
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(url.toURI)),
      java.nio.charset.StandardCharsets.UTF_8).trim
  }

  private lazy val staged: Map[String, Row] = {
    import spark.implicits._
    val scholix = Seq(fixture("scholix_page1.json")).toDF("raw")
    val works = Seq(
      fixture("works_crossref_full.json"),
      fixture("works_crossref_minimal.json"),
      fixture("works_datacite.json")).toDF("raw")
    // tracked dim deliberately lower-case; scholix targets are upper-case
    val tracked = Seq("10.5063/f1kw5cxn", "10.5063/f1z899cz").toDF("doi")
    val out = CitationHarvest.harvestStaging(scholix, works, tracked)
    CitationStaging.validate(out) // idempotent; throws on contract drift
    out.collect().map(r => r.getString(1) -> r).toMap // keyed by source_id
  }

  test("scholix page explodes to link-packages; untracked targets drop") {
    // 5 packages on the page, 1 targets a DOI we don't track
    assert(staged.size == 4)
    assert(!staged.contains("10.1002/lno.11078"), "untracked target kept")
  }

  test("crossref full body: field paths, author name fallback, day truncation") {
    val r = staged("10.1002/ecy.2562")
    assert(r.getString(0) == "10.5063/F1KW5CXN") // target kept verbatim
    assert(r.getString(2) == "https://doi.org/10.1002/ecy.2562")
    assert(r.getString(3) == "2019-03-15") // LinkPublicationDate[:10]
    // author 2 has only a corporate `name`, author 3 has nothing -> ""
    assert(r.getString(4) == "Matthew B. Jones, Arctic Data Consortium, ")
    assert(r.getString(5) == "Ecological archives at scale") // title[0]
    assert(r.getString(6) == "Wiley")
    assert(r.getString(7) == "Ecology") // container-title[0] -> journal
    assert(r.getString(8) == "100" && r.getString(9) == "e02562")
    assert(r.getInt(10) == 2019) // created.date-parts[0][0]
    assert(r.getString(11).contains("link-packages")) // verbatim envelope
    assert(r.getString(12).contains("\"DOI\":\"10.1002/ecy.2562\""))
  }

  test("crossref minimal body: absent container-title/volume/page stay null") {
    val r = staged("10.3389/fmars.2021.751710")
    assert(r.getString(4) == "Lin Qi")
    assert(r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9))
    assert(r.getInt(10) == 2021)
  }

  test("datacite body: attribute mapping, literal author, case-insensitive join") {
    val r = staged("10.18739/A2KW57J9H") // scholix source kept verbatim
    assert(r.getString(3) == "2020-11-02")
    assert(r.getString(4) == "Sonia Nagorski, Alaska LTER Site Team")
    assert(r.getString(5) == "Glacier stream geochemistry 2017-2019")
    assert(r.getString(6) == "Arctic Data Center") // container-title -> publisher
    assert(r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9)) // not in DataCite set
    assert(r.getInt(10) == 2020) // published "2020" -> int
  }

  test("source without a works body stages with null metadata, verbatim report") {
    val r = staged("10.1234/orphan.paper")
    assert(r.getString(3) == "2023-05-17")
    (4 to 10).foreach(i => assert(r.isNullAt(i), s"field $i not null"))
    assert(r.isNullAt(12)) // no metadata payload
    assert(r.getString(11).contains("10.1234/orphan.paper")) // report kept
  }

  test("tracked-DOI filter is a broadcast semi-join, works join hash-based") {
    import spark.implicits._
    val scholix = Seq(fixture("scholix_page1.json")).toDF("raw")
    val works = Seq(fixture("works_datacite.json")).toDF("raw")
    val tracked = Seq("10.5063/f1kw5cxn").toDF("doi")
    val plan = CitationHarvest.harvestStaging(scholix, works, tracked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), s"tracked filter not a broadcast semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}

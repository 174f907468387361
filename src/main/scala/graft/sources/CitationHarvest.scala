package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S10 — file-backed replay of the Crossref/DataCite citation harvester.
  *
  * The reference's `getCitations` (`metricsdatabase.py:277-394`) walks the
  * Crossref event-data scholix endpoint, filters link-packages to targets
  * it tracks, fetches per-source work metadata from the Crossref or
  * DataCite works APIs (`getDOIMetadata`, `metricsdatabase.py:745-829`),
  * and lands rows shaped like [[CitationStaging.schema]]. The network I/O
  * stays out of engine scope; THIS object is everything after the bytes
  * arrive — the parse of the actual wire envelopes into the staging
  * contract, so contract drift is caught at the parse edge rather than
  * downstream.
  *
  * All parsing is `from_json` with explicit schemas + codegen'd column
  * functions — no UDFs, so a harvest replay over a large response archive
  * stays whole-stage-codegen'd and the tracked-DOI filter is a broadcast
  * semi-join.
  */
object CitationHarvest {

  /** Crossref event-data scholix envelope
    * (`metricsdatabase.py:296-315`): `message.link-packages[]`, each with
    * Target/Source identifier blocks and the link publication timestamp. */
  val scholixSchema: StructType = {
    val identifier = StructType(Seq(
      StructField("ID", StringType),
      StructField("IDScheme", StringType),
      StructField("IDUrl", StringType)))
    val endpoint = StructType(Seq(
      StructField("Identifier", identifier),
      StructField("Type", StructType(Seq(StructField("Name", StringType))))))
    StructType(Seq(StructField("message", StructType(Seq(
      StructField("link-packages", ArrayType(StructType(Seq(
        StructField("Target", endpoint),
        StructField("Source", endpoint),
        StructField("LinkPublicationDate", StringType),
        StructField("RelationshipType", StructType(Seq(
          StructField("Name", StringType)))))))))))))
  }

  /** Union schema of the two works-API response shapes: a Crossref works
    * body has a `message` object (`metricsdatabase.py:334-345,786-825`), a
    * DataCite works body a `data.attributes` object
    * (`metricsdatabase.py:320-333,765-782`); exactly one side is non-null
    * per response, which is how the agency is detected without a second
    * round-trip. */
  val worksSchema: StructType = {
    val crossrefAuthor = StructType(Seq(
      StructField("given", StringType),
      StructField("family", StringType),
      StructField("name", StringType)))
    val dataciteAuthor = StructType(Seq(
      StructField("given", StringType),
      StructField("family", StringType),
      StructField("literal", StringType)))
    StructType(Seq(
      StructField("message", StructType(Seq(
        StructField("DOI", StringType),
        StructField("author", ArrayType(crossrefAuthor)),
        StructField("title", ArrayType(StringType)),
        StructField("publisher", StringType),
        StructField("container-title", ArrayType(StringType)),
        StructField("volume", StringType),
        StructField("page", StringType),
        StructField("created", StructType(Seq(
          StructField("date-parts", ArrayType(ArrayType(IntegerType))))))))),
      StructField("data", StructType(Seq(
        StructField("id", StringType),
        StructField("attributes", StructType(Seq(
          StructField("doi", StringType),
          StructField("author", ArrayType(dataciteAuthor)),
          StructField("title", StringType),
          StructField("container-title", StringType),
          StructField("published", StringType)))))))))
  }

  /** Scholix responses (one raw JSON envelope per row in `rawCol`) →
    * one row per link-package: (target_id, source_id, source_url,
    * link_publication_date, report). The date keeps the reference's
    * `[:10]` ISO-day truncation; `report` is the verbatim envelope, as the
    * reference stores it (`metricsdatabase.py:285,375`). */
  def parseScholix(responses: DataFrame, rawCol: String): DataFrame =
    responses
      .select(col(rawCol).as("report"),
        from_json(col(rawCol), scholixSchema).as("m"))
      .select(col("report"),
        explode(col("m.message").getField("link-packages")).as("lp"))
      .select(
        col("lp.Target.Identifier.ID").as("target_id"),
        col("lp.Source.Identifier.ID").as("source_id"),
        col("lp.Source.Identifier.IDUrl").as("source_url"),
        substring(col("lp.LinkPublicationDate"), 1, 10)
          .as("link_publication_date"),
        col("report"))

  /** Works-API responses (one raw JSON body per row in `rawCol`) → one
    * metadata row per work: (work_doi, origin, title, publisher, journal,
    * volume, page, year_of_publishing, metadata), with the per-agency
    * field mapping of `metricsdatabase.py:316-360`:
    *
    *  - Crossref: authors "given family" (falling back to the corporate
    *    `name`, then empty), `title[0]`, `publisher`,
    *    `container-title[0]` → journal, `volume`, `page`,
    *    `created.date-parts[0][0]` → year.
    *  - DataCite: authors "given family" (falling back to `literal`, then
    *    empty), `title`, `container-title` → publisher, `published` →
    *    year; journal/volume/page are not in the DataCite attribute set.
    */
  def parseWorks(responses: DataFrame, rawCol: String): DataFrame = {
    val parsed = responses.select(col(rawCol).as("metadata"),
      from_json(col(rawCol), worksSchema).as("w"))
    val isCrossref = col("w.message").isNotNull
    val crossrefOrigin = array_join(
      transform(col("w.message.author"), a =>
        coalesce(concat(a.getField("given"), lit(" "), a.getField("family")),
          a.getField("name"), lit(""))), ", ")
    val dataciteOrigin = array_join(
      transform(col("w.data.attributes.author"), a =>
        coalesce(concat(a.getField("given"), lit(" "), a.getField("family")),
          a.getField("literal"), lit(""))), ", ")
    parsed.select(
      when(isCrossref, col("w.message.DOI"))
        .otherwise(coalesce(col("w.data.attributes.doi"), col("w.data.id")))
        .as("work_doi"),
      when(isCrossref, crossrefOrigin).otherwise(dataciteOrigin).as("origin"),
      when(isCrossref, element_at(col("w.message.title"), 1))
        .otherwise(col("w.data.attributes.title")).as("title"),
      when(isCrossref, col("w.message.publisher"))
        .otherwise(col("w.data.attributes.container-title")).as("publisher"),
      when(isCrossref, element_at(col("w.message.`container-title`"), 1))
        .otherwise(lit(null).cast("string")).as("journal"),
      when(isCrossref, col("w.message.volume"))
        .otherwise(lit(null).cast("string")).as("volume"),
      when(isCrossref, col("w.message.page"))
        .otherwise(lit(null).cast("string")).as("page"),
      when(isCrossref,
        element_at(element_at(col("w.message.created").getField("date-parts"),
          1), 1))
        .otherwise(col("w.data.attributes.published").cast("int"))
        .as("year_of_publishing"),
      col("metadata"))
  }

  /** The full harvest replay: scholix link-packages filtered to tracked
    * target DOIs (the reference's `in doi.lower()` membership check,
    * `metricsdatabase.py:300`, as a case-insensitive broadcast semi-join),
    * enriched with per-source work metadata, emitted in the
    * [[CitationStaging]] contract shape (validated before return).
    *
    * Scale shape: the tracked-DOI dim broadcasts (it is the repository's
    * own dataset catalog); the works join keys on the citing DOI — works
    * metadata is one row per distinct citing work, orders of magnitude
    * smaller than the link stream, so AQE broadcasts it too on real sizes.
    */
  def harvestStaging(scholixResponses: DataFrame, worksResponses: DataFrame,
                     trackedDois: DataFrame): DataFrame = {
    val links = parseScholix(scholixResponses, "raw")
    val works = parseWorks(worksResponses, "raw")
    val tracked = trackedDois
      .select(lower(col("doi")).as("tracked_doi")).distinct()
    val staged = links
      .join(broadcast(tracked),
        lower(col("target_id")) === col("tracked_doi"), "left_semi")
      .join(works, lower(col("source_id")) === lower(col("work_doi")), "left")
      .select(col("target_id"), col("source_id"), col("source_url"),
        col("link_publication_date"), col("origin"), col("title"),
        col("publisher"), col("journal"), col("volume"), col("page"),
        col("year_of_publishing"), col("report"), col("metadata"))
    CitationStaging.validate(staged)
    staged
  }
}

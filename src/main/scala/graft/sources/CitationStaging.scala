package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** S10 staging contract: the schema an external Crossref/DataCite citation
  * harvester must land for the engine's citation pipeline to consume.
  *
  * The reference harvests the Crossref event-data scholix endpoint and
  * inserts rows into its `citations` table
  * (`metricsdatabase.py:277-394`, table DDL `00-metrics-tables.sql:35-51`).
  * That REST harvesting is deliberately OUT of engine scope here — it is
  * connector I/O, not query processing — but the boundary needs a concrete
  * contract, which this schema is: the connector writes parquet/JSONL rows
  * of this shape to a staging path; everything downstream (registration
  * dedup, relation normalization, citation counts) is engine territory.
  *
  * Field provenance (scholix `link-packages` → staging row,
  * `metricsdatabase.py:300-315`):
  *  - `target_id`   ← `Target.Identifier.ID` — the cited dataset (DOI).
  *  - `source_id`   ← `Source.Identifier.ID` — the citing work (DOI).
  *  - `source_url`  ← `Source.Identifier.IDUrl`.
  *  - `link_publication_date` ← `LinkPublicationDate[:10]` (ISO day) — when
  *    Crossref first recorded the relation.
  *  - `origin`, `title`, `publisher`, `journal`, `volume`, `page`,
  *    `year_of_publishing` ← per-work metadata fetched from the Crossref /
  *    DataCite works APIs (`metricsdatabase.py:316-360`); nullable because
  *    either agency can lack them.
  *  - `report`, `metadata` ← the verbatim JSON payloads, kept for replay
  *    exactly as the reference stores them (JSON columns in the DDL).
  *
  * Natural key: (`target_id`, `source_id`, `link_publication_date`) — the
  * reference's primary key (`00-metrics-tables.sql:50`); the engine's
  * registration anti-join dedups on it.
  *
  * Validating query: `c_citation_register` (ReportQueries.scala) runs the
  * downstream contract — from_json parse with this field set, anti-join
  * against already-registered (target_id, source_id) pairs, per-month
  * counts — in the graded correctness gate.
  */
object CitationStaging {

  /** Staging schema, 1:1 with the reference's `citations` DDL minus the
    * serial surrogate id (files don't need one; the natural key rules). */
  val schema: StructType = StructType(Seq(
    StructField("target_id", StringType, nullable = false),
    StructField("source_id", StringType, nullable = false),
    StructField("source_url", StringType, nullable = true),
    StructField("link_publication_date", StringType, nullable = false),
    StructField("origin", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("publisher", StringType, nullable = true),
    StructField("journal", StringType, nullable = true),
    StructField("volume", StringType, nullable = true),
    StructField("page", StringType, nullable = true),
    StructField("year_of_publishing", IntegerType, nullable = true),
    StructField("report", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true)))

  /** Column names of the natural key the registration dedup joins on. */
  val naturalKey: Seq[String] =
    Seq("target_id", "source_id", "link_publication_date")

  /** Conformance check for a staged frame: every contract field present
    * with a compatible type (extra connector-side columns are allowed and
    * ignored downstream). Throws with the full delta, not just the first
    * miss, so a connector author sees one actionable message. */
  def validate(staged: DataFrame): Unit = {
    val have = staged.schema.map(f => f.name -> f.dataType).toMap
    val problems = schema.flatMap { f =>
      have.get(f.name) match {
        case None => Some(s"missing column: ${f.name} (${f.dataType.sql})")
        case Some(t) if t != f.dataType =>
          Some(s"column ${f.name}: expected ${f.dataType.sql}, got ${t.sql}")
        case _ => None
      }
    }
    require(problems.isEmpty,
      s"staged citations do not match the S10 contract:\n  " +
        problems.mkString("\n  "))
  }
}

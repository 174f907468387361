package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time enrichment column ops — the Spark rebuild of the reference's
  * logstash filter chain + Python taggers (SURVEY.md §2.2 F8–F16).
  *
  * Everything here is a pure `Column` expression: the whole enrichment chain
  * fuses into the scan's whole-stage-codegen pass — no UDFs, no extra stage,
  * no shuffle. The regex/CIDR dictionaries are constant-folded into the plan
  * exactly like the reference's pre-joined mega-regex
  * (`elastic_notes.rst:160-172`).
  */
object Enrich {

  /** Dotted-quad IPv4 → long, as a codegen'd higher-order function. */
  def ipToLong(ip: Column): Column =
    aggregate(transform(split(ip, "\\."), x => x.cast("long")),
      lit(0L), (acc, x) => acc * 256 + x)

  /** F9: CIDR membership (`search.conf:286-302` dataone/robot IP lists).
    * The CIDR list is parsed driver-side into (base, prefixLen) and folded
    * into one boolean expression — the broadcast-dimension degenerate case.
    * For huge lists (>1k ranges) switch to a broadcast range-join instead.
    */
  def ipInCidrs(ip: Column, cidrs: Seq[String]): Column = {
    val ipl = ipToLong(ip)
    // foldLeft, not reduce: an empty list (tenant with no ranges) is
    // simply "never matches", not a plan-build crash
    cidrs.foldLeft(lit(false)) { (acc, c) =>
      require(c.contains("/"), s"malformed CIDR (missing /prefix): $c")
      val Array(base, plen) = c.split("/")
      val baseLong = base.split("\\.").foldLeft(0L)((a, o) => a * 256 + o.toLong)
      val shiftBits = 32 - plen.toInt
      acc || (shiftrightunsigned(ipl, shiftBits) === lit(baseLong >>> shiftBits))
    }
  }

  /** Load a regex dictionary shipped as a classpath resource: one pattern
    * per line, blank lines and `#` comments dropped, anchors/classes kept
    * verbatim (the dictionaries contain `^ruby$`, `[^a]fish`, `\d{1,2}`). */
  private def loadDict(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/dict/$name")
    require(in != null, s"missing dictionary resource: graft/dict/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }

  /** OR-join dictionary patterns into one case-insensitive regex. Each
    * pattern is wrapped in a non-capturing group so per-pattern anchors and
    * alternations keep their own scope — `^ruby$` stays anchored instead of
    * anchoring the whole alternation. This is the reference's pre-joined
    * mega-regex build (`elastic_notes.rst:160-172`) done at class-load time;
    * the resulting literal constant-folds into the scan's codegen pass. */
  def orJoinDict(patterns: Seq[String]): String =
    patterns.map(p => s"(?:$p)").mkString("(?i)", "|", "")

  /** F10: robot / machine user-agent tagging — the full COUNTER robots list
    * (279 patterns, ref `conf/dict/counter_ua.yml:1-279`) and machine-agent
    * list (34 patterns, `machine_ua.yml:1-35`), per `search.conf:305-327`.
    * Both dictionaries use only constructs valid in java.util.regex AND RE2,
    * so the same pattern string drives Spark `rlike` and the DuckDB oracle. */
  val RobotUaDict: Seq[String] = loadDict("counter_ua.txt")
  val MachineUaDict: Seq[String] = loadDict("machine_ua.txt")
  val RobotUaPattern: String = orJoinDict(RobotUaDict)
  val MachineUaPattern: String = orJoinDict(MachineUaDict)

  /** Build the `tags[]` column from tag→predicate pairs, dropping non-firing
    * tags (reference accumulates tags via logstash add_tag). */
  def tags(tagPredicates: Seq[(String, Column)]): Column =
    filter(
      array(tagPredicates.map { case (t, p) => when(p, lit(t)) }: _*),
      x => x.isNotNull)

  /** F13: ingest-time derived session key `md5(ip + ua) | yyyyMMddHH`
    * (`search.conf:335-352`). */
  def sessionKey(ip: Column, ua: Column, ts: Column): Column =
    concat(md5(concat_ws(" ", ip, ua)), lit("|"),
      date_format(ts, "yyyyMMddHH"))

  /** F16: search-event flag — request-path prefix test
    * (`metricselasticsearch.py:1008-1010`). */
  def searchEvent(request: Column, prefix: String): Column =
    request.startsWith(prefix)

  /** Geohash encoding — the reference's `geohash_1..9` event fields and the
    * `geohash4` rollup dimension (`elastic_notes.rst:236-238`,
    * `00-metrics-tables.sql:26`). Standard interleaved-bit base32, built
    * from pure column arithmetic (no UDF): bit i of the interleaved stream
    * comes from halving either the lon (even i) or lat (odd i) interval.
    */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    val nBits = precision * 5
    // normalized fractions clamped to [0, 1): the boundary inputs lat=90 /
    // lon=180 would otherwise yield fraction 1.0, whose bits are all zero
    // — encoding the north pole as the SOUTH pole's cell
    val latF = least((lat + 90.0) / 180.0, lit(0.9999999999999999))
    val lonF = least((lon + 180.0) / 360.0, lit(0.9999999999999999))
    // bit i (0-based) of value: floor(f * 2^(k+1)) % 2 where k = index among
    // that coordinate's bits
    def bit(f: Column, k: Int): Column =
      floor(f * math.pow(2, k + 1)).cast("long") % 2
    val bits = (0 until nBits).map { i =>
      if (i % 2 == 0) bit(lonF, i / 2) else bit(latF, i / 2)
    }
    val chars = bits.grouped(5).map { g =>
      val idx = g.zipWithIndex.map { case (b, j) => b * (16 >> j) }
        .reduce(_ + _).cast("int")
      // element_at is 1-based
      element_at(lit(base32.toCharArray.map(_.toString)), idx + 1)
    }
    concat(chars.toSeq: _*)
  }

  /** DOI canonicalization per node — the reference's per-repository ID
    * rewrite rules (`es_sysmeta_sync.py:403-438`), as a when/otherwise chain.
    * `rules` maps a source-predicate to the canonical-id expression; first
    * match wins, `fallback` otherwise.
    */
  /** Range-dimension lookup (the GeoIP range-table shape, F15): each fact
    * ip matches the dimension row whose [range_start, range_end] contains
    * it. A raw BETWEEN theta join degenerates to a nested loop; instead
    * both sides key on coarse buckets (`ip >> bucketBits`) — a range
    * explodes into every bucket it overlaps — turning the lookup into an
    * EQUI-join plus a residual range filter. At 100 TB the dimension
    * (GeoIP: ~millions of rows) broadcasts or shuffles on the bucket key;
    * the fact side never cross-products. Bucket width tunes duplication:
    * a range spanning B buckets appears B times on the build side.
    *
    * @param ranges (range_start, range_end, payload...) — non-overlapping.
    */
  def rangeLookup(facts: DataFrame, ipCol: Column, ranges: DataFrame,
                  bucketBits: Int): DataFrame = {
    val rb = ranges.withColumn("_bucket",
      explode(sequence(shiftright(col("range_start"), bucketBits),
        shiftright(col("range_end"), bucketBits))))
    facts.withColumn("_bucket", shiftright(ipCol, bucketBits))
      .join(rb, Seq("_bucket"))
      .filter(ipCol >= col("range_start") && ipCol <= col("range_end"))
      .drop("_bucket")
  }

  /** Interval-overlap join — two tables of [start, end] intervals matched
    * where they overlap (`a.start <= b.end && b.start <= a.end`): media
    * segments × annotation spans, sessions × incident windows. Same
    * bucket discipline as [[rangeLookup]]: both sides explode into the
    * coarse buckets their interval covers and equi-join on bucket with a
    * residual overlap filter. An overlapping pair co-occurs in every
    * shared bucket, so each pair is EMITTED only in its canonical bucket
    * (the first shared one = max of the two start buckets) — exact,
    * duplicate-row-preserving (no distinct pass), no extra shuffle.
    * Bucket width should be on the order of typical interval length: too
    * fine multiplies the explode, too coarse the residual comparisons. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   bucketBits: Int): DataFrame = {
    val lB = left.withColumn("_bucket", explode(sequence(
      shiftright(col(lStart), bucketBits), shiftright(col(lEnd), bucketBits))))
    val rB = right.withColumn("_bucket", explode(sequence(
      shiftright(col(rStart), bucketBits), shiftright(col(rEnd), bucketBits))))
    lB.join(rB, Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("_bucket") === greatest(shiftright(col(lStart), bucketBits),
          shiftright(col(rStart), bucketBits)))
      .drop("_bucket")
  }

  /** DataCite inverse-relation normalization from the citation POST path
    * (`citationsmanager.py:36-54,213-223`): inbound relation types map to
    * their canonical outbound form; already-canonical values pass through;
    * anything else is null (the reference rejects with a 500). */
  val RelationTypeMap: Map[String, String] = Map(
    "iscitedby" -> "cites", "issupplementto" -> "issupplementedby",
    "iscontinuedby" -> "continues", "isdescribedby" -> "describes",
    "hasmetadata" -> "ismetadatafor", "hasversion" -> "isversionof",
    "isnewversionof" -> "isversionof", "ispartof" -> "haspart",
    "isreferencedby" -> "references", "isdocumentedby" -> "documents",
    "iscompiledby" -> "compiles", "isvariantformof" -> "isoriginalformof",
    "isidenticalto" -> "*", "isreviewedby" -> "reviews",
    "isderivedfrom" -> "issourceof", "requires" -> "isrequiredby",
    "isobsoletedby" -> "obsoletes")

  def normalizeRelationType(rel: Column): Column = {
    val lowered = lower(rel)
    val mapped = RelationTypeMap.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(lowered === k, v).otherwise(acc)
    }
    when(mapped.isNotNull, mapped)
      .when(lowered.isin(RelationTypeMap.values.toSeq.distinct: _*), lowered)
      .otherwise(lit(null))
  }

  /** The reference's DOI acceptance pattern (`citationsmanager.py:230`),
    * anchored: optional scheme/resolver/"doi:" prefixes, then
    * `10.<4+ digits>/suffix`. Two defects of the reference's regex are
    * CORRECTED here (conformance delta, same policy as the zero-fill
    * partial-month fix): sub-element prefixes accept multi-digit parts
    * (`(\.\d+)*`, the reference's `(\.\d)*` rejects the DOI handbook's own
    * `10.1000.10/123` example), and the resolver-host dots are escaped
    * (the reference's `doi.org/` also matched `doiXorg/`). */
  val DoiPattern: String =
    "^\\s*(http://|https://)?(doi\\.org/|dx\\.doi\\.org/)?(doi: ?|DOI: ?)?(10\\.\\d{4,}(\\.\\d+)*)/(\\w+).*$"

  def isDoiLike(id: Column): Column = id.rlike(DoiPattern)

  /** Canonical DOI core — the J1 scale-path normalization (SURVEY.md
    * §7.4.3): strip scheme/resolver/`doi:` decoration down to the
    * lower-cased `10.<prefix>/<suffix>` registry form, so identifier
    * matching becomes an EQUI-join on this value instead of the
    * reference's substring containment scan (`metricsreader.py:440-462`).
    * Uses only RE2-safe constructs so the identical pattern string drives
    * both Spark and the DuckDB oracle. Non-DOI input yields `''` (Spark's
    * regexp_extract no-match value) — filter those out before joining. */
  val DoiCorePattern: String = "(10\\.\\d{4,}(?:\\.\\d+)*/\\S+)"

  def normalizeDoi(id: Column): Column =
    lower(regexp_extract(id, DoiCorePattern, 1))

  def canonicalId(rules: Seq[(Column, Column)], fallback: Column): Column =
    rules.foldRight(fallback) { case ((pred, value), acc) =>
      when(pred, value).otherwise(acc)
    }
}

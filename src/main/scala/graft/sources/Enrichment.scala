package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ip.IpKit

/** Enrichment reference-table loaders — SURVEY.md §2.1 S8 / §2.2 M11-M15.
  *
  * The reference loads these with Python cron jobs into Postgres
  * (`/root/reference/scripts/geo-csv-to-psql.py:33-40`,
  * `cron_scripts/rpki/rpki_validator.py:26-73`,
  * `cron_scripts/peeringdb/peeringdb.py:38-60`,
  * `cron_scripts/gen-whois/gen_whois_route.py:192-216`). Here each is a
  * `spark.read` + canonicalization into a broadcast-ready DataFrame;
  * refresh = re-run the loader and swap (the upsert semantics of
  * M11-M15 reduce to overwrite/merge via [[graft.operators.MergeOps]]).
  */
object Enrichment {

  /** geo_ip CSV: family, ip(prefix), country, stateprov, city, lat, lon,
    * tz_offset, tz_name, isp_name — canonicalized with the numeric
    * prefix range for the LPM join (J5/T5).
    */
  val geoIpSchema: StructType = StructType(Seq(
    StructField("family", IntegerType),
    StructField("ip", StringType),
    StructField("country", StringType),
    StructField("stateprov", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timezone_offset", DoubleType),
    StructField("timezone_name", StringType),
    StructField("isp_name", StringType)))

  def loadGeoIpCsv(spark: SparkSession, path: String): DataFrame =
    IpKit.withPrefixRange(
      spark.read.schema(geoIpSchema).option("header", "false").csv(path),
      "ip")

  /** rpki_validator JSON export: `{"roas":[{"asn":"AS65001",
    * "prefix":"10.0.0.0/8","maxLength":24},…]}` → (prefix, prefix_len,
    * prefix_len_max, origin_as) + numeric range for the covering join
    * (J6). The "AS" prefix strip mirrors `rpki_validator.py:42-62`.
    */
  def loadRpkiJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val roas = raw.select(explode(col("roas")).as("r"))
      .select(
        regexp_replace(col("r.asn").cast("string"), "^AS", "").cast(LongType).as("origin_as"),
        col("r.prefix").as("prefix"),
        col("r.maxLength").cast(IntegerType).as("prefix_len_max"))
      .withColumn("prefix_len", IpKit.inetMaskLen(col("prefix")))
    IpKit.withPrefixRange(roas, "prefix")
  }

  /** info_asn rows (whois/peeringdb merge — M13): whois inserts are
    * DO-NOTHING, peeringdb rows overwrite; precedence = peeringdb last.
    */
  def mergeInfoAsn(whois: DataFrame, peeringdb: DataFrame): DataFrame = {
    val w = whois.select("asn", "as_name", "source")
    val p = peeringdb.select("asn", "as_name", "source")
    // peeringdb overwrites; whois fills the gaps (left_anti = DO NOTHING)
    p.unionByName(w.join(p.select("asn"), Seq("asn"), "left_anti"))
  }

  /** info_route upsert prep (M12): one row per (prefix, origin_as) like
    * the reference's `DISTINCT ON` (`gen_whois_route.py:194-216`) —
    * which, with no ORDER BY, keeps an INSERT-ORDER-arbitrary row. A
    * distributed engine has no stable insert order, so the tiebreak
    * here is deterministic instead (greatest descr wins): idempotent
    * re-runs produce identical tables, which the reference's arbitrary
    * pick cannot guarantee.
    */
  def distinctRoutes(routes: DataFrame): DataFrame =
    graft.operators.MergeOps.dedupToLatest(
      routes, Seq("prefix", "origin_as"), Seq("descr"))

  /** M14 pdb_exchange_peers (`cron_scripts/peeringdb/peeringdb.py:48-60`):
    * IX-peer rows keyed (ix_id, peer_ipv4, peer_ipv6); every non-key
    * column takes the incoming value on conflict (ON CONFLICT DO UPDATE
    * SET all columns = excluded.*). The loader reads the PeeringDB-shaped
    * JSON export; the merge is the standard last-write-wins overwrite.
    */
  val pdbIxPeerSchema: StructType = StructType(Seq(
    StructField("ix_id", LongType),
    StructField("ix_name", StringType),
    StructField("ix_prefix_v4", StringType),
    StructField("ix_prefix_v6", StringType),
    StructField("rs_peer", BooleanType),
    StructField("peer_name", StringType),
    StructField("peer_ipv4", StringType),
    StructField("peer_ipv6", StringType),
    StructField("peer_asn", LongType),
    StructField("speed", LongType),
    StructField("policy", StringType),
    StructField("poc_policy_email", StringType),
    StructField("poc_noc_email", StringType),
    StructField("ix_city", StringType),
    StructField("ix_country", StringType),
    StructField("ix_region", StringType),
    StructField("ts_us", LongType)))

  val pdbIxPeerKeys: Seq[String] = Seq("ix_id", "peer_ipv4", "peer_ipv6")

  def loadPdbIxPeersJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pdbIxPeerSchema).json(path)
      // the PK is (ix_id, peer_ipv4, peer_ipv6) — NULL keys can't upsert
      .na.fill("", Seq("peer_ipv4", "peer_ipv6"))
      .filter(col("ix_id").isNotNull)

  /** Refresh merge: updates overwrite current on the IX-peer key. */
  def mergePdbIxPeers(current: DataFrame, updates: DataFrame): DataFrame =
    graft.streaming.Ingest.overwriteMerge(current, updates, pdbIxPeerKeys, Seq("ts_us"))
}

package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OpenBMP parsed-message model — one schema per bus topic, with the
  * TSV envelope parsing and cell coercions of the reference consumer
  * (SURVEY.md §1.3, §2.1 S2/S3).
  *
  * Field sets mirror what the reference Query classes serialize
  * (`/root/reference/src/main/java/org/openbmp/psqlquery/
  * UnicastPrefixQuery.java:49-97`, `BaseAttributeQuery.java:42-77`,
  * `PeerQuery.java:42-106`, `RouterQuery.java:42-78`,
  * `CollectorQuery.java:33-52`, `BmpStatQuery.java:28-53`,
  * `L3VpnPrefixQuery.java:47-91`).
  *
  * Coercions (`processor/ParseNullAsEmpty.java`, `ParseLongEmptyAsZero
  * .java`, `ParseTimestamp.java`): null string → "", empty numeric → 0,
  * timestamps `yyyy-MM-dd HH:mm:ss[.SSSSSS]` UTC.
  */
object Messages {

  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  // ---- schemas (TSV column order = serialization order) --------------

  val unicastPrefixSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("peer_hash_id", StringType),
    StructField("base_attr_hash_id", StringType),
    StructField("isIPv4", StringType),
    StructField("origin_as", StringType),
    StructField("prefix", StringType),
    StructField("prefix_len", StringType),
    StructField("timestamp", StringType),
    StructField("isWithdrawn", StringType),
    StructField("path_id", StringType),
    StructField("labels", StringType),
    StructField("isPrePolicy", StringType),
    StructField("isAdjRibIn", StringType)))

  val baseAttributeSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("peer_hash_id", StringType),
    StructField("origin", StringType),
    StructField("as_path", StringType),
    StructField("origin_as", StringType),
    StructField("next_hop", StringType),
    StructField("med", StringType),
    StructField("local_pref", StringType),
    StructField("isAtomicAgg", StringType),
    StructField("aggregator", StringType),
    StructField("community_list", StringType),
    StructField("ext_community_list", StringType),
    StructField("large_community_list", StringType),
    StructField("cluster_list", StringType),
    StructField("originator_id", StringType),
    StructField("as_path_count", StringType),
    StructField("nexthop_isIPv4", StringType),
    StructField("timestamp", StringType)))

  val peerSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("router_hash_id", StringType),
    StructField("peer_rd", StringType),
    StructField("isIPv4", StringType),
    StructField("peer_addr", StringType),
    StructField("name", StringType),
    StructField("peer_bgp_id", StringType),
    StructField("peer_as", StringType),
    StructField("action", StringType),
    StructField("isL3VPNpeer", StringType),
    StructField("timestamp", StringType),
    StructField("isPrePolicy", StringType),
    StructField("local_ip", StringType),
    StructField("local_bgp_id", StringType),
    StructField("local_port", StringType),
    StructField("local_hold_time", StringType),
    StructField("local_asn", StringType),
    StructField("remote_port", StringType),
    StructField("remote_hold_time", StringType),
    StructField("sent_capabilities", StringType),
    StructField("recv_capabilities", StringType),
    StructField("bmp_reason", StringType),
    StructField("bgp_err_code", StringType),
    StructField("bgp_err_subcode", StringType),
    StructField("error_text", StringType),
    StructField("isLocRib", StringType),
    StructField("isLocRibFiltered", StringType),
    StructField("table_name", StringType)))

  val routerSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("name", StringType),
    StructField("ip_address", StringType),
    StructField("timestamp", StringType),
    StructField("action", StringType),
    StructField("term_code", StringType),
    StructField("term_reason", StringType),
    StructField("term_data", StringType),
    StructField("init_data", StringType),
    StructField("description", StringType),
    StructField("bgp_id", StringType),
    StructField("collector_hash_id", StringType)))

  val collectorSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("action", StringType),
    StructField("admin_id", StringType),
    StructField("routers", StringType),
    StructField("router_count", StringType),
    StructField("timestamp", StringType)))

  val bmpStatSchema: StructType = StructType(Seq(
    StructField("peer_hash_id", StringType),
    StructField("timestamp", StringType),
    StructField("prefixes_rejected", StringType),
    StructField("known_dup_prefixes", StringType),
    StructField("known_dup_withdraws", StringType),
    StructField("invalid_cluster_list", StringType),
    StructField("invalid_as_path", StringType),
    StructField("invalid_originator", StringType),
    StructField("invalid_as_confed", StringType),
    StructField("routes_adj_rib_in", StringType),
    StructField("routes_loc_rib", StringType)))

  /** l3vpn = unicast_prefix + rd + ext_community_list
    * (`L3VpnPrefixQuery.java:47-91`).
    */
  val l3vpnSchema: StructType = StructType(
    unicastPrefixSchema.fields ++ Seq(
      StructField("rd", StringType),
      StructField("ext_community_list", StringType)))

  /** ls_node key fields (`LsNodeQuery.java:44-84`). */
  val lsNodeSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("peer_hash_id", StringType),
    StructField("base_attr_hash_id", StringType),
    StructField("seq", StringType),
    StructField("asn", StringType),
    StructField("bgp_ls_id", StringType),
    StructField("igp_router_id", StringType),
    StructField("ospf_area_id", StringType),
    StructField("protocol", StringType),
    StructField("router_id", StringType),
    StructField("isis_area_id", StringType),
    StructField("flags", StringType),
    StructField("name", StringType),
    StructField("mt_ids", StringType),
    StructField("sr_capabilities", StringType),
    StructField("isWithdrawn", StringType),
    StructField("timestamp", StringType)))

  /** ls_link key fields (`LsLinkQuery.java:65-131`). */
  val lsLinkSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("peer_hash_id", StringType),
    StructField("base_attr_hash_id", StringType),
    StructField("seq", StringType),
    StructField("local_node_hash_id", StringType),
    StructField("remote_node_hash_id", StringType),
    StructField("intf_ip", StringType),
    StructField("nei_ip", StringType),
    StructField("mt_id", StringType),
    StructField("local_link_id", StringType),
    StructField("remote_link_id", StringType),
    StructField("admin_group", StringType),
    StructField("max_link_bw", StringType),
    StructField("max_resv_bw", StringType),
    StructField("unreserved_bw", StringType),
    StructField("te_def_metric", StringType),
    StructField("protection_type", StringType),
    StructField("mpls_proto_mask", StringType),
    StructField("igp_metric", StringType),
    StructField("srlg", StringType),
    StructField("name", StringType),
    StructField("isWithdrawn", StringType),
    StructField("timestamp", StringType),
    // trailing reference columns (`LsLinkQuery.java:26-32` insert list) —
    // appended last so shorter fixture lines parse with trailing nulls
    StructField("local_igp_router_id", StringType),
    StructField("local_router_id", StringType),
    StructField("remote_igp_router_id", StringType),
    StructField("remote_router_id", StringType),
    StructField("local_asn", StringType),
    StructField("remote_asn", StringType),
    StructField("peer_node_sid", StringType),
    StructField("sr_adjacency_sids", StringType)))

  /** ls_prefix key fields (`LsPrefixQuery.java:53-99`). */
  val lsPrefixSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType),
    StructField("peer_hash_id", StringType),
    StructField("base_attr_hash_id", StringType),
    StructField("seq", StringType),
    StructField("local_node_hash_id", StringType),
    StructField("mt_id", StringType),
    StructField("ospf_route_type", StringType),
    StructField("igp_flags", StringType),
    StructField("route_tag", StringType),
    StructField("ext_route_tag", StringType),
    StructField("ospf_fwd_addr", StringType),
    StructField("metric", StringType),
    StructField("prefix", StringType),
    StructField("prefix_len", StringType),
    StructField("isWithdrawn", StringType),
    StructField("timestamp", StringType)))

  /** Valid enum domains (`1_base.sql:28-32`) — Spark has no enum type;
    * ingest validates into StringType.
    */
  val LsProtocols = Set("IS-IS_L1", "IS-IS_L2", "OSPFv2", "OSPFv3", "Direct", "Static", "")
  val OspfRouteTypes = Set("Intra", "Inter", "Ext-1", "Ext-2", "NSSA-1", "NSSA-2", "")

  // ---- envelope parse + coercions ------------------------------------

  /** S2: parse a raw TSV `line` column into typed fields (all-string
    * schema first; coercions applied per target type below).
    */
  def parseTsv(df: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("__p",
      from_csv(col(lineCol), schema, Map("sep" -> "\t", "quote" -> "")))
    schema.fields.foldLeft(parsed)((d, f) => d.withColumn(f.name, col(s"__p.${f.name}")))
      .drop("__p")
  }

  /** S3 coercions — the ParseNullAsEmpty / ParseLongEmptyAsZero /
    * ParseTimestamp processors as column transforms.
    */
  def nullAsEmpty(c: Column): Column = coalesce(c, lit(""))
  def longEmptyAsZero(c: Column): Column =
    coalesce(nullif(trim(c), lit("")).cast(LongType), lit(0L))
  /** Numeric cell that is legitimately ABSENT (peer session fields on a
    * down message): empty → NULL, matching the reference's nullable
    * columns — where [[longEmptyAsZero]] is for counters that default 0.
    */
  def longEmptyAsNull(c: Column): Column = nullif(trim(c), lit("")).cast(LongType)
  def parseTs(c: Column): Column =
    coalesce(
      to_timestamp(c, TsFormat),
      to_timestamp(c, "yyyy-MM-dd HH:mm:ss"))
  def boolCell(c: Column): Column =
    trim(lower(c)).isin("1", "true", "t")

  /** Space-delimited numeric array (`PsqlFunctions.java:65-91`).
    * Null/empty cells → empty array (from_csv yields null for empty
    * unquoted TSV cells).
    */
  def longArray(c: Column): Column = {
    val s = trim(coalesce(c, lit("")))
    when(length(s) === 0, array().cast(ArrayType(LongType)))
      .otherwise(transform(split(s, " +"), x => x.cast(LongType)))
  }

  /** Space-delimited string array (community lists, `PsqlFunctions.java:154-205`). */
  def strArray(c: Column): Column = {
    val s = trim(coalesce(c, lit("")))
    when(length(s) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(s, " +"))
  }

  /** Typed unicast_prefix records from raw TSV lines: applies the
    * coercions and the reference's `prefix_len > 128` drop
    * (`UnicastPrefixQuery.java:50-51`), plus epoch-micros `ts_us` for
    * the numeric time path.
    */
  def unicastPrefixFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, unicastPrefixSchema)
      .withColumn("isIPv4", boolCell(col("isIPv4")))
      .withColumn("origin_as", longEmptyAsZero(col("origin_as")))
      .withColumn("prefix_len", longEmptyAsZero(col("prefix_len")).cast(IntegerType))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
      .withColumn("isWithdrawn", boolCell(col("isWithdrawn")))
      .withColumn("path_id", longEmptyAsZero(col("path_id")))
      .withColumn("labels", nullAsEmpty(col("labels")))
      .withColumn("isPrePolicy", boolCell(col("isPrePolicy")))
      .withColumn("isAdjRibIn", boolCell(col("isAdjRibIn")))
      .filter(col("prefix_len") <= 128)

  def baseAttributeFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, baseAttributeSchema)
      .withColumn("as_path", longArray(col("as_path")))
      .withColumn("origin_as", longEmptyAsZero(col("origin_as")))
      .withColumn("med", longEmptyAsZero(col("med")))
      .withColumn("local_pref", longEmptyAsZero(col("local_pref")))
      .withColumn("isAtomicAgg", boolCell(col("isAtomicAgg")))
      .withColumn("community_list", strArray(col("community_list")))
      .withColumn("ext_community_list", strArray(col("ext_community_list")))
      .withColumn("large_community_list", strArray(col("large_community_list")))
      .withColumn("cluster_list", strArray(col("cluster_list")))
      .withColumn("as_path_count", longEmptyAsZero(col("as_path_count")).cast(IntegerType))
      .withColumn("nexthop_isIPv4", boolCell(col("nexthop_isIPv4")))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))

  def peerFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, peerSchema)
      .withColumn("isIPv4", boolCell(col("isIPv4")))
      .withColumn("peer_as", longEmptyAsZero(col("peer_as")))
      // action first/up → state 'up' else 'down' (PeerQuery.java:59-64)
      .withColumn("state", when(col("action").isin("first", "up"), lit("up")).otherwise(lit("down")))
      .withColumn("isL3VPNpeer", boolCell(col("isL3VPNpeer")))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
      .withColumn("isPrePolicy", boolCell(col("isPrePolicy")))
      // numeric session/error fields (nullable in the reference schema,
      // 1_base.sql:181-196): empty → NULL long, not 0 — a down message
      // carries no session and peerEventLog must emit NULLs for it
      .withColumn("local_port", longEmptyAsNull(col("local_port")))
      .withColumn("local_hold_time", longEmptyAsNull(col("local_hold_time")))
      .withColumn("local_asn", longEmptyAsNull(col("local_asn")))
      .withColumn("remote_port", longEmptyAsNull(col("remote_port")))
      .withColumn("remote_hold_time", longEmptyAsNull(col("remote_hold_time")))
      .withColumn("bgp_err_code", longEmptyAsNull(col("bgp_err_code")))
      .withColumn("bgp_err_subcode", longEmptyAsNull(col("bgp_err_subcode")))
      .withColumn("isLocRib", boolCell(col("isLocRib")))
      .withColumn("isLocRibFiltered", boolCell(col("isLocRibFiltered")))

  def routerFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, routerSchema)
      // action term → 'down' else 'up' (RouterQuery.java:55)
      .withColumn("state", when(col("action") === "term", lit("down")).otherwise(lit("up")))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))

  def collectorFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, collectorSchema)
      // action stopped → 'down' (CollectorQuery.java:33-52)
      .withColumn("state", when(col("action") === "stopped", lit("down")).otherwise(lit("up")))
      .withColumn("router_count", longEmptyAsZero(col("router_count")).cast(IntegerType))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))

  def l3vpnFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    parseTsv(raw, lineCol, l3vpnSchema)
      .withColumn("isIPv4", boolCell(col("isIPv4")))
      .withColumn("origin_as", longEmptyAsZero(col("origin_as")))
      .withColumn("prefix_len", longEmptyAsZero(col("prefix_len")).cast(IntegerType))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
      .withColumn("isWithdrawn", boolCell(col("isWithdrawn")))
      .withColumn("path_id", longEmptyAsZero(col("path_id")))
      .withColumn("isPrePolicy", boolCell(col("isPrePolicy")))
      .withColumn("isAdjRibIn", boolCell(col("isAdjRibIn")))
      .withColumn("rd", nullAsEmpty(col("rd")))
      .withColumn("ext_community_list", strArray(col("ext_community_list")))
      .filter(col("prefix_len") <= 128)

  private def lsCommon(df: DataFrame): DataFrame =
    df.withColumn("seq", longEmptyAsZero(col("seq")))
      .withColumn("isWithdrawn", boolCell(col("isWithdrawn")))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
      // enum validation (1_base.sql:28-32): unknown → ''
      .withColumn("protocol",
        when(col("protocol").isin(LsProtocols.toSeq: _*), col("protocol"))
          .otherwise(lit("")))

  def lsNodeFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    lsCommon(parseTsv(raw, lineCol, lsNodeSchema)
      .withColumn("asn", longEmptyAsZero(col("asn"))))

  def lsLinkFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    lsCommon(parseTsv(raw, lineCol, lsLinkSchema).withColumn("protocol", lit("")))
      .withColumn("igp_metric", longEmptyAsZero(col("igp_metric")))
      .withColumn("local_asn", longEmptyAsZero(col("local_asn")))
      .withColumn("remote_asn", longEmptyAsZero(col("remote_asn")))

  def lsPrefixFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame =
    lsCommon(parseTsv(raw, lineCol, lsPrefixSchema).withColumn("protocol", lit("")))
      .withColumn("prefix_len", longEmptyAsZero(col("prefix_len")).cast(IntegerType))
      .withColumn("metric", longEmptyAsZero(col("metric")))
      .withColumn("ospf_route_type",
        when(col("ospf_route_type").isin(OspfRouteTypes.toSeq: _*),
          col("ospf_route_type")).otherwise(lit("")))

  def bmpStatFromTsv(raw: DataFrame, lineCol: String = "line"): DataFrame = {
    val parsed = parseTsv(raw, lineCol, bmpStatSchema)
    bmpStatSchema.fieldNames.filterNot(Set("peer_hash_id", "timestamp"))
      .foldLeft(parsed)((d, c) => d.withColumn(c, longEmptyAsZero(col(c))))
      .withColumn("timestamp", parseTs(col("timestamp")))
      .withColumn("ts_us", unix_micros(col("timestamp")))
  }
}

package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ip.IpKit

/** The reference's reporting views (`/root/reference/database/
  * 8_views.sql`, `10_l3vpn.sql:81-122`) as DataFrame pipelines over the
  * materialized state tables. Registered per session via
  * `df.createOrReplaceTempView` so `spark.sql("SELECT … FROM v_ip_routes")`
  * works exactly like the reference's Postgres surface (SURVEY §3.3).
  *
  * Join shapes (SURVEY §2.4): all inner/left equi-joins — Catalyst
  * broadcasts the dimension sides (routers/peers/info_asn are tiny next
  * to the RIB); the RIB-side join keys are the state-table bucket keys
  * so no RIB shuffle is required.
  */
object BmpViews {

  /** `CASE WHEN length(name) > 0 THEN name ELSE host(ip) END`
    * (`8_views.sql:11,13,33-34`).
    */
  def nameOrHost(name: Column, ip: Column): Column =
    when(length(name) > 0, name).otherwise(IpKit.inetHost(ip))

  /** v_peers (`8_views.sql:10-29`): peers ⋈ routers ⟕ info_asn. */
  def vPeers(peers: DataFrame, routers: DataFrame, infoAsn: DataFrame): DataFrame =
    peers.as("p")
      .join(routers.as("r"), col("p.router_hash_id") === col("r.hash_id"), "inner")
      .join(broadcast(infoAsn.as("i")), col("p.peer_as") === col("i.asn"), "left")
      .select(
        nameOrHost(col("r.name"), col("r.ip_address")).as("RouterName"),
        nameOrHost(col("p.name"), col("p.peer_addr")).as("PeerName"),
        col("p.hash_id").as("peer_hash_id"),
        col("p.router_hash_id").as("router_hash_id"),
        col("p.peer_addr").as("PeerIP"),
        col("p.peer_as").as("PeerASN"),
        col("p.state").as("peer_state"),
        col("p.isIPv4").as("isPeerIPv4"),
        col("i.as_name").as("as_name"))

  /** v_ip_routes (`8_views.sql:31-51`): rib ⋈ peers ⋈ attrs ⋈ routers.
    * Attr join is on the composite (hash_id AND peer_hash_id) key.
    */
  def vIpRoutes(rib: DataFrame, peers: DataFrame, attrs: DataFrame,
                routers: DataFrame): DataFrame =
    routesView(rib, peers, attrs, routers, Nil, Nil)

  /** Single rib⋈peers⋈attrs⋈routers chain behind both route views:
    * one rib scan, dims broadcast; `ribExtra`/`attrExtra` append
    * (column → output alias) pairs for the l3vpn variant.
    */
  private def routesView(rib: DataFrame, peers: DataFrame, attrs: DataFrame,
                         routers: DataFrame,
                         ribExtra: Seq[(String, String)],
                         attrExtra: Seq[(String, String)]): DataFrame =
    rib.as("rib")
      .join(peers.as("p"), col("rib.peer_hash_id") === col("p.hash_id"), "inner")
      .join(attrs.as("a"),
        col("rib.base_attr_hash_id") === col("a.hash_id") &&
          col("rib.peer_hash_id") === col("a.peer_hash_id"), "inner")
      .join(routers.as("r"), col("p.router_hash_id") === col("r.hash_id"), "inner")
      .select(Seq(
        nameOrHost(col("r.name"), col("r.ip_address")).as("RouterName"),
        nameOrHost(col("p.name"), col("p.peer_addr")).as("PeerName"),
        col("rib.prefix").as("Prefix"),
        col("rib.prefix_len").as("PrefixLen"),
        col("a.origin").as("Origin"),
        col("rib.origin_as").as("Origin_AS"),
        col("a.med").as("MED"),
        col("a.local_pref").as("LocalPref"),
        col("a.next_hop").as("NH"),
        col("a.as_path").as("AS_Path"),
        col("a.as_path_count").as("ASPath_Count"),
        col("a.community_list").as("Communities"),
        col("a.cluster_list").as("ClusterList"),
        col("a.aggregator").as("Aggregator"),
        col("p.peer_addr").as("PeerAddress"),
        col("p.peer_as").as("PeerASN"),
        col("rib.isIPv4").as("isIPv4"),
        col("p.isIPv4").as("isPeerIPv4"),
        col("p.isL3VPNpeer").as("isPeerVPN"),
        col("rib.ts_us").as("LastModified"),
        col("rib.hash_id").as("rib_hash_id"),
        col("rib.base_attr_hash_id").as("base_hash_id"), // reference surface name (8_views.sql:46)
        col("rib.peer_hash_id").as("peer_hash_id"),
        col("p.router_hash_id").as("router_hash_id"),
        col("rib.isWithdrawn").as("isWithdrawn")) ++
        ribExtra.map { case (c, a) => col(s"rib.$c").as(a) } ++
        attrExtra.map { case (c, a) => col(s"a.$c").as(a) }: _*)

  /** v_ip_routes_history-style status label (`8_views.sql:95,112`). */
  def withdrawnLabel(isWithdrawn: Column): Column =
    when(isWithdrawn, lit("Withdrawn")).otherwise(lit("Advertised"))

  /** v_ip_routes_history (`8_views.sql:81-103`): the SAME 4-way join
    * shape as [[vIpRoutes]] over the CDC log, with the
    * Withdrawn/Advertised `event` label — the reference history view is
    * a join view, not the raw log (which registers separately as
    * `ip_rib_log`). Mirrors [[vL3vpnRoutesHistory]].
    */
  def vIpRoutesHistory(ribLog: DataFrame, peers: DataFrame, attrs: DataFrame,
                       routers: DataFrame): DataFrame =
    vIpRoutes(ribLog, peers, attrs, routers)
      .withColumn("event", withdrawnLabel(col("isWithdrawn")))

  /** v_ls_links (`8_views.sql:138-142`): two joins to the same node dim. */
  def vLsLinks(links: DataFrame, nodes: DataFrame): DataFrame =
    links.as("ln")
      .join(nodes.as("l"),
        col("ln.local_node_hash_id") === col("l.hash_id") &&
          col("ln.peer_hash_id") === col("l.peer_hash_id"), "inner")
      .join(nodes.as("r"),
        col("ln.remote_node_hash_id") === col("r.hash_id") &&
          col("ln.peer_hash_id") === col("r.peer_hash_id"), "inner")
      .select(
        col("l.name").as("Local_Node"),
        col("r.name").as("Remote_Node"),
        col("ln.hash_id").as("link_hash_id"),
        col("ln.peer_hash_id").as("peer_hash_id"),
        col("ln.isWithdrawn").as("isWithdrawn"))

  /** v_ls_nodes pseudo-node filter (`8_views.sql:122`):
    * `igp_router_id ~ '\..[1-9A-F]00$'` exclusion + `NOT LIKE '%]'`.
    */
  def lsNodeFilter(igpRouterId: Column): Column =
    !igpRouterId.rlike("\\..[1-9A-F]00$") && !igpRouterId.endsWith("]")

  /** F7: OSPF uses router_id, IS-IS the IGP router id (`8_views.sql:113,131`). */
  def routerIdByProtocol(protocol: Column, routerId: Column, igpRouterId: Column): Column =
    when(protocol.isin("OSPFv2", "OSPFv3"), routerId).otherwise(igpRouterId)

  /** v_ls_nodes (`8_views.sql:104-131`): nodes ⋈ peers ⋈ routers with
    * the pseudo-node exclusion and the protocol-dependent router id.
    */
  def vLsNodes(nodes: DataFrame, peers: DataFrame, routers: DataFrame): DataFrame =
    nodes.as("n")
      .join(peers.as("p"), col("n.peer_hash_id") === col("p.hash_id"), "inner")
      .join(routers.as("r"), col("p.router_hash_id") === col("r.hash_id"), "inner")
      .filter(lsNodeFilter(col("n.igp_router_id")))
      .select(
        nameOrHost(col("r.name"), col("r.ip_address")).as("RouterName"),
        nameOrHost(col("p.name"), col("p.peer_addr")).as("PeerName"),
        col("n.name").as("Node_Name"),
        routerIdByProtocol(col("n.protocol"), col("n.router_id"), col("n.igp_router_id"))
          .as("Router_ID"),
        col("n.protocol").as("Protocol"),
        col("n.hash_id").as("node_hash_id"),
        col("n.peer_hash_id").as("peer_hash_id"),
        col("n.isWithdrawn").as("isWithdrawn"))

  /** v_ls_prefixes (`8_views.sql:145-153`): prefixes ⋈ their local node. */
  def vLsPrefixes(prefixes: DataFrame, nodes: DataFrame): DataFrame =
    prefixes.as("pf")
      .join(nodes.as("n"),
        col("pf.local_node_hash_id") === col("n.hash_id") &&
          col("pf.peer_hash_id") === col("n.peer_hash_id"), "inner")
      .select(
        col("n.name").as("Node_Name"),
        col("pf.prefix").as("Prefix"),
        col("pf.prefix_len").as("PrefixLen"),
        col("pf.metric").as("Metric"),
        col("pf.ospf_route_type").as("RouteType"),
        col("pf.hash_id").as("prefix_hash_id"),
        col("pf.peer_hash_id").as("peer_hash_id"),
        col("pf.isWithdrawn").as("isWithdrawn"))

  /** v_l3vpn_routes (`10_l3vpn.sql:81-101`): the v_ip_routes join shape
    * plus RD, extended communities, and — when the state tables carry
    * them — the reference view's remaining columns (path_id, labels,
    * isPrePolicy/isAdjRibIn, FirstAddedTimestamp from the rib;
    * LargeCommunities from base_attrs). Optional passthrough keeps the
    * view usable over reduced test fixtures while matching the full
    * reference surface on full-schema state.
    */
  def vL3vpnRoutes(rib: DataFrame, peers: DataFrame, attrs: DataFrame,
                   routers: DataFrame): DataFrame = {
    val ribExtra =
      Seq("rd" -> "RD", "ext_community_list" -> "ExtCommunities") ++
        Seq("path_id", "labels", "isPrePolicy", "isAdjRibIn")
          .filter(rib.columns.contains).map(c => c -> c) ++
        (if (rib.columns.contains("first_added_ts_us"))
          Seq("first_added_ts_us" -> "FirstAddedTimestamp") else Nil)
    val attrExtra =
      if (attrs.columns.contains("large_community_list"))
        Seq("large_community_list" -> "LargeCommunities") else Nil
    // one join chain, ONE rib scan — a vIpRoutes + rib self-join would
    // re-scan and re-shuffle the biggest table for columns the first
    // scan already read
    routesView(rib, peers, attrs, routers, ribExtra, attrExtra)
  }

  /** v_l3vpn_routes_history (`10_l3vpn.sql:105-122`): the same join
    * shape over the l3vpn CDC log with the Withdrawn/Advertised event
    * label.
    */
  def vL3vpnRoutesHistory(ribLog: DataFrame, peers: DataFrame, attrs: DataFrame,
                          routers: DataFrame): DataFrame =
    vL3vpnRoutes(ribLog, peers, attrs, routers)
      .withColumn("event", withdrawnLabel(col("isWithdrawn")))

  /** Register the reporting surface on a session: materialized state
    * tables under their reference names + the derived v_* views, so
    * `spark.sql("SELECT … FROM v_ip_routes WHERE …")` works exactly like
    * the reference's Postgres query surface (SURVEY §3.3). Catalyst
    * expands views inline — filters push through into the state scans.
    */
  def registerAll(rib: DataFrame, peers: DataFrame, attrs: DataFrame,
                  routers: DataFrame, infoAsn: DataFrame,
                  ribLog: Option[DataFrame] = None): Unit = {
    rib.createOrReplaceTempView("ip_rib")
    peers.createOrReplaceTempView("bgp_peers")
    attrs.createOrReplaceTempView("base_attrs")
    routers.createOrReplaceTempView("routers")
    infoAsn.createOrReplaceTempView("info_asn")
    vPeers(peers, routers, infoAsn).createOrReplaceTempView("v_peers")
    val routes = vIpRoutes(rib, peers, attrs, routers)
    routes.createOrReplaceTempView("v_ip_routes")
    routes.filter(!col("isWithdrawn")).createOrReplaceTempView("v_ip_routes_active")
    ribLog.foreach { lg =>
      lg.createOrReplaceTempView("ip_rib_log")
      vIpRoutesHistory(lg, peers, attrs, routers)
        .createOrReplaceTempView("v_ip_routes_history")
    }
  }

  /** Register the link-state surface (`8_views.sql:104-153`): the three
    * ls state tables under their reference names plus v_ls_nodes /
    * v_ls_links / v_ls_prefixes.
    */
  def registerLinkState(nodes: DataFrame, links: DataFrame, prefixes: DataFrame,
                        peers: DataFrame, routers: DataFrame): Unit = {
    nodes.createOrReplaceTempView("ls_nodes")
    links.createOrReplaceTempView("ls_links")
    prefixes.createOrReplaceTempView("ls_prefixes")
    vLsNodes(nodes, peers, routers).createOrReplaceTempView("v_ls_nodes")
    vLsLinks(links, nodes).createOrReplaceTempView("v_ls_links")
    vLsPrefixes(prefixes, nodes).createOrReplaceTempView("v_ls_prefixes")
  }

  /** Register the l3vpn surface (`10_l3vpn.sql:81-122`): l3vpn_rib (+
    * log) under the reference names plus v_l3vpn_routes and the l3vpn
    * history view.
    */
  def registerL3vpn(rib: DataFrame, peers: DataFrame, attrs: DataFrame,
                    routers: DataFrame, ribLog: Option[DataFrame] = None): Unit = {
    rib.createOrReplaceTempView("l3vpn_rib")
    vL3vpnRoutes(rib, peers, attrs, routers).createOrReplaceTempView("v_l3vpn_routes")
    ribLog.foreach { lg =>
      lg.createOrReplaceTempView("l3vpn_rib_log")
      vL3vpnRoutesHistory(lg, peers, attrs, routers)
        .createOrReplaceTempView("v_l3vpn_routes_history")
    }
  }

  /** Geo enrichment of v_ip_routes (`8_views.sql:76`,
    * `v_ip_routes_geo`): LPM left-join against the geo table — see
    * [[graft.operators.LpmJoin]] for the strategy.
    *
    * Strategy selection: below `rangeJoinMaxDimRows` the dim broadcasts
    * into a nested-loop range join (cheapest for the reference-sized
    * geo tables — no per-probe candidate explode); above it the
    * nested loop's |probes|·|dim| comparisons stop surviving scale and
    * the ancestor-expansion EQUI-join takes over
    * ([[graft.operators.LpmJoin.lpmByExpansionBinary]], |probes|·|lens|
    * hashed rows, any family). Both strategies are value-identical
    * (LpmJoinSpec property; q52 vs q73 share one oracle).
    */
  def vIpRoutesGeo(routes: DataFrame, geo: DataFrame,
                   rangeJoinMaxDimRows: Long = 100000,
                   dimSizeHint: Option[Long] = None): DataFrame = {
    val g0 = IpKit.withPrefixRange(geo, "ip")
      .select(col("ip").as("geo_ip"), col("ip_start"), col("ip_end"), col("ip_len"),
        col("country"), col("city"))
    // the reference view shows LIVE routes only (8_views.sql:79 WHERE
    // isWithdrawn = false); slim callers (tests) may pass frames
    // without the flag
    val live =
      if (routes.columns.contains("isWithdrawn")) routes.filter(!col("isWithdrawn"))
      else routes
    // slim probe: only the join keys + derived address cross the LPM —
    // the route join chain is evaluated on BOTH the probe and restore
    // sides of this enrich-then-join-back, so the probe must not drag
    // the ~24 route columns through the LPM join.
    val probed = live.select(col("rib_hash_id"), col("peer_hash_id"),
      IpKit.inetNum(IpKit.inetHost(col("Prefix"))).as("__addr"))
    // LEFT semantics like the reference view: routes with no covering
    // geo prefix keep null geo columns, never drop. Family guard: the
    // binary forms are 4 bytes (v4) vs 16 bytes (v6); without it a v4
    // probe compares lexicographically inside v6 ranges (reference
    // inet && never matches across families) — the expansion path gets
    // the same guard structurally from fixed binary widths. Both
    // branches break (start, len) ties by least geo_ip, so the two
    // strategies stay value-identical on duplicate geo prefixes.
    // Strategy pick from FREE plan statistics — no count job (round-5
    // verdict nit): parquet sources expose sizeInBytes (and rowCount
    // under CBO) at plan time. The byte→row fallback deliberately
    // UNDER-divides (64 B/row compressed is small for an (ip, country,
    // city) dim), overestimating rows and biasing mid-size dims toward
    // the expansion path — the one that survives being wrong at scale.
    // dimSizeHint still overrides for callers that know better.
    val dimRows: Long = dimSizeHint.getOrElse {
      val stats = geo.queryExecution.optimizedPlan.stats
      stats.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse(
        (stats.sizeInBytes / 64).min(BigInt(Long.MaxValue)).toLong.max(1L))
    }
    val matched =
      if (dimRows <= rangeJoinMaxDimRows)
        graft.operators.LpmJoin.lpmRange(
          probed, Seq("rib_hash_id", "peer_hash_id"), "__addr",
          broadcast(g0), "ip_start", "ip_end", "ip_len",
          tieBreak = Seq(col("geo_ip").asc),
          extraCond = length(col("__addr")) === length(col("ip_start")))
          .select(col("rib_hash_id"), col("peer_hash_id"),
            col("geo_ip"), col("country"), col("city"))
      else
        graft.operators.LpmJoin.lpmByExpansionBinary(
          probed, Seq("rib_hash_id", "peer_hash_id"), "__addr",
          g0, "ip_start", "ip_len",
          payload = Seq("geo_ip", "country", "city"), tieBreakAsc = "geo_ip",
          broadcastDim = false)
          .select(col("rib_hash_id"), col("peer_hash_id"),
            col("geo_ip"), col("country"), col("city"))
    live.join(matched, Seq("rib_hash_id", "peer_hash_id"), "left")
  }
}

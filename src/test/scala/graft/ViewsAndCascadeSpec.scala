package graft

import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.views.BmpViews

class ViewsAndCascadeSpec extends SparkSpec {
  import spark.implicits._

  test("v_* views register and answer SQL like the reference surface") {
    val rib = Seq(
      ("r1", "p1", "a1", "10.0.0.0", 8, 65001L, true, 1000L, false),
      ("r2", "p1", "a2", "10.1.0.0", 16, 65002L, true, 1001L, true))
      .toDF("hash_id", "peer_hash_id", "base_attr_hash_id", "prefix",
        "prefix_len", "origin_as", "isIPv4", "ts_us", "isWithdrawn")
    val peers = Seq(("p1", "rt1", "10.9.9.1", "", "10.9.9.1", 65100L, "up", true, false))
      .toDF("hash_id", "router_hash_id", "peer_addr", "name", "peer_bgp_id",
        "peer_as", "state", "isIPv4", "isL3VPNpeer")
    val attrs = Seq(
      ("a1", "p1", "igp", Seq(65001L), "10.0.0.9", 0L, 100L, Seq("65001:1"),
        Seq[String](), "", 1),
      ("a2", "p1", "igp", Seq(65002L, 65001L), "10.0.0.9", 0L, 100L, Seq[String](),
        Seq[String](), "", 2))
      .toDF("hash_id", "peer_hash_id", "origin", "as_path", "next_hop", "med",
        "local_pref", "community_list", "cluster_list", "aggregator", "as_path_count")
    val routers = Seq(("rt1", "edge-router", "10.8.8.1", "ch1", "up", 900L))
      .toDF("hash_id", "name", "ip_address", "collector_hash_id", "state", "ts_us")
    val infoAsn = Seq((65100L, "Acme Transit")).toDF("asn", "as_name")

    BmpViews.registerAll(rib, peers, attrs, routers, infoAsn)

    val active = spark.sql(
      "SELECT Prefix, RouterName, PeerName, AS_Path FROM v_ip_routes WHERE NOT isWithdrawn")
    val row = active.head()
    assert(active.count() === 1)
    assert(row.getAs[String]("Prefix") === "10.0.0.0")
    assert(row.getAs[String]("RouterName") === "edge-router")
    assert(row.getAs[String]("PeerName") === "10.9.9.1") // empty name → host(peer_addr)
    assert(row.getAs[Seq[Long]]("AS_Path") === Seq(65001L))

    val vp = spark.sql("SELECT PeerASN, as_name FROM v_peers").head()
    assert(vp.getAs[String]("as_name") === "Acme Transit") // left join hit
  }

  test("full reference view surface registers: every view answers spark.sql by name") {
    val rib = Seq(("r1", "p1", "a1", "10.0.0.0", 8, 65001L, true, 1000L, false))
      .toDF("hash_id", "peer_hash_id", "base_attr_hash_id", "prefix",
        "prefix_len", "origin_as", "isIPv4", "ts_us", "isWithdrawn")
    val peers = Seq(("p1", "rt1", "10.9.9.1", "peer-one", "10.9.9.1", 65100L, "up",
      true, false))
      .toDF("hash_id", "router_hash_id", "peer_addr", "name", "peer_bgp_id",
        "peer_as", "state", "isIPv4", "isL3VPNpeer")
    val attrs = Seq(("a1", "p1", "igp", Seq(65001L), "10.0.0.9", 0L, 100L,
      Seq("65001:1"), Seq[String](), "", 1))
      .toDF("hash_id", "peer_hash_id", "origin", "as_path", "next_hop", "med",
        "local_pref", "community_list", "cluster_list", "aggregator", "as_path_count")
    val routers = Seq(("rt1", "edge-router", "10.8.8.1", "ch1", "up", 900L))
      .toDF("hash_id", "name", "ip_address", "collector_hash_id", "state", "ts_us")
    val infoAsn = Seq((65100L, "Acme Transit")).toDF("asn", "as_name")
    val nodes = Seq(
      ("n1", "p1", "node-a", "0100.0a0a.0a01", "10.10.10.1", "IS-IS_L2", false),
      ("n2", "p1", "node-b", "0100.0a0a.0a02", "10.10.10.2", "OSPFv2", false))
      .toDF("hash_id", "peer_hash_id", "name", "igp_router_id", "router_id",
        "protocol", "isWithdrawn")
    val links = Seq(("lk1", "p1", "n1", "n2", false))
      .toDF("hash_id", "peer_hash_id", "local_node_hash_id", "remote_node_hash_id",
        "isWithdrawn")
    val lsPrefixes = Seq(("pf1", "p1", "n1", "10.10.0.0", 16, 20L, "intra", false))
      .toDF("hash_id", "peer_hash_id", "local_node_hash_id", "prefix", "prefix_len",
        "metric", "ospf_route_type", "isWithdrawn")
    val vpnRib = rib.withColumn("rd", lit("100:1"))
      .withColumn("ext_community_list", array(lit("rt=100:1")))
      .withColumn("path_id", lit(7L))
      .withColumn("labels", lit("16001"))

    BmpViews.registerAll(rib, peers, attrs, routers, infoAsn, ribLog = Some(rib))
    BmpViews.registerLinkState(nodes, links, lsPrefixes, peers, routers)
    BmpViews.registerL3vpn(vpnRib, peers, attrs, routers, ribLog = Some(vpnRib))

    val surface = Seq(
      "ip_rib", "bgp_peers", "base_attrs", "routers", "info_asn",
      "v_peers", "v_ip_routes", "v_ip_routes_active",
      "ip_rib_log", "v_ip_routes_history",
      "ls_nodes", "ls_links", "ls_prefixes",
      "v_ls_nodes", "v_ls_links", "v_ls_prefixes",
      "l3vpn_rib", "v_l3vpn_routes", "l3vpn_rib_log", "v_l3vpn_routes_history")
    surface.foreach { v =>
      assert(spark.sql(s"SELECT * FROM $v").columns.nonEmpty, s"view $v")
    }

    // semantic spot checks across the newly registered views
    val link = spark.sql(
      "SELECT Local_Node, Remote_Node FROM v_ls_links").head()
    assert(link.getString(0) === "node-a" && link.getString(1) === "node-b")
    // protocol-dependent Router_ID: IS-IS → igp_router_id, OSPF → router_id
    val ids = spark.sql("SELECT Node_Name, Router_ID FROM v_ls_nodes")
      .as[(String, String)].collect().toMap
    assert(ids === Map("node-a" -> "0100.0a0a.0a01", "node-b" -> "10.10.10.2"))
    assert(spark.sql("SELECT Prefix FROM v_ls_prefixes").head().getString(0)
      === "10.10.0.0")
    val vpn = spark.sql(
      "SELECT rd, ExtCommunities, path_id, labels FROM v_l3vpn_routes").head()
    assert(vpn.getAs[String]("rd") === "100:1")
    assert(vpn.getAs[Long]("path_id") === 7L) // optional passthrough present
    assert(vpn.getAs[String]("labels") === "16001")
    assert(spark.sql("SELECT event FROM v_l3vpn_routes_history").head()
      .getString(0) === "Advertised")
  }

  test("T6 peer default naming: both-zero peers inherit name/bgp_id from router") {
    val peers = Seq(
      ("p1", "rt1", "0.0.0.0", "orig-name", "0.0.0.0"), // both zero → inherit
      ("p2", "rt1", "0.0.0.0", "keep-two", "10.0.0.2"), // addr zero only → keep
      ("p3", "rt1", "10.0.0.3", "keep-three", "0.0.0.0"), // bgp zero only → keep
      ("p4", "rt-missing", "0.0.0.0", "keep-four", "0.0.0.0")) // no router → NULLs
      .toDF("hash_id", "router_hash_id", "peer_addr", "name", "peer_bgp_id")
    val routers = Seq(("rt1", "edge-router", "10.8.8.1"))
      .toDF("hash_id", "name", "ip_address")
    val out = Ingest.inheritPeerDefaults(peers, routers)
      .select("hash_id", "name", "peer_bgp_id")
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("p1") === ("edge-router", "10.8.8.1"))
    assert(out("p2") === ("keep-two", "10.0.0.2"))
    assert(out("p3") === ("keep-three", "0.0.0.0"))
    assert(out("p4") === (null, null)) // trigger's SELECT INTO with no row
  }

  test("vIpRoutesGeo never matches across address families (inet && semantics)") {
    // 40.1.2.3's 4-byte form lies lexicographically inside 2800::/12's
    // 16-byte [start,end]; without the family guard the v6 range would
    // win (len 12 > nothing) or outrank a real v4 match via len desc
    val routes = Seq(
      ("r1", "p1", "40.1.2.3/32"),   // v4, no v4 geo covering → null geo
      ("r2", "p1", "10.1.2.3/32"),   // v4, covered by 10.0.0.0/8
      ("r3", "p1", "2800:0:1::5/128")) // v6, covered by 2800::/12
      .toDF("rib_hash_id", "peer_hash_id", "Prefix")
    val geo = Seq(
      ("2800::/12", "BR", "Sao Paulo"),
      ("10.0.0.0/8", "US", "Denver"))
      .toDF("ip", "country", "city")
    val out = BmpViews.vIpRoutesGeo(routes, geo)
      .select("rib_hash_id", "country").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("r1" -> null, "r2" -> "US", "r3" -> "BR"))

    // large-dim strategy (forced via threshold 0): the expansion
    // equi-join path must produce the identical view, family guard and
    // left semantics included
    val outExp = BmpViews.vIpRoutesGeo(routes, geo, rangeJoinMaxDimRows = 0)
      .select("rib_hash_id", "country").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(outExp === out)

    // reference view filters withdrawn routes (8_views.sql:79) — when
    // the input carries the flag, withdrawn rows must not appear, on
    // EITHER strategy
    val flagged = routes.withColumn("isWithdrawn", col("rib_hash_id") === "r2")
    for (threshold <- Seq(100000L, 0L)) {
      val live = BmpViews.vIpRoutesGeo(flagged, geo, rangeJoinMaxDimRows = threshold)
        .select("rib_hash_id").collect().map(_.getString(0)).toSet
      assert(live === Set("r1", "r3"), s"threshold=$threshold")
    }
  }

  test("T4 peer event log: up rows carry session fields, down rows error fields") {
    val peers = graft.model.Messages.peerFromTsv(Seq(
      (Seq("p1", "r1", "", "1", "10.0.0.9", "peer9", "10.0.0.9", "65009", "up",
        "0", "2024-01-01 00:00:01.000000", "1", "10.0.0.1", "10.0.0.1", "179",
        "90", "65000", "40000", "90", "caps-s", "caps-r", "", "", "", "",
        "0", "0", "t") ++ Seq()).mkString("\t"),
      (Seq("p2", "r1", "", "1", "10.0.0.8", "peer8", "10.0.0.8", "65008", "down",
        "0", "2024-01-01 00:00:02.000000", "1", "", "", "", "", "", "", "",
        "", "", "reason-x", "6", "2", "cease", "0", "0", "t")).mkString("\t"))
      .toDF("line"))
    val log = Ingest.peerEventLog(peers).collect()
      .map(r => r.getAs[String]("peer_hash_id") -> r).toMap
    assert(log("p1").getAs[String]("local_ip") === "10.0.0.1")
    assert(log("p1").getAs[String]("bmp_reason") === null)
    assert(log("p2").getAs[String]("local_ip") === null)
    assert(log("p2").getAs[String]("bmp_reason") === "reason-x")
    assert(log("p2").getAs[String]("error_text") === "cease")
  }

  test("FIXTURES scenario 2: peer down/up flap → event log + stale RIB purge") {
    // RIB before the flap: two routes learned from p1, one from p2
    val rib = Seq(
      ("h1", "p1", 100L), ("h2", "p1", 200L), ("h3", "p2", 100L))
      .toDF("hash_id", "peer_hash_id", "ts_us")
    // p1 flaps: down at t=300, back up at t=400 (the up message is the
    // purge trigger — PeerQuery.java:121-153 deletes older rows)
    def peerLine(action: String, ts: String) =
      (Seq("p1", "r1", "", "1", "10.0.0.9", "peer9", "10.0.0.9", "65009", action,
        "0", ts, "1") ++ Seq.fill(16)("")).mkString("\t")
    val flap = graft.model.Messages.peerFromTsv(Seq(
      peerLine("down", "1970-01-01 00:00:00.000300"),
      peerLine("up", "1970-01-01 00:00:00.000400")).toDF("line"))

    // T4: both transitions land in the event log
    val events = Ingest.peerEventLog(flap)
      .select("state").as[String].collect().sorted.toSeq
    assert(events === Seq("down", "up"))

    // T9: the up message purges p1's pre-flap routes; p2 untouched
    val upMsgs = flap.filter(col("state") === "up")
      .select(col("hash_id"), col("ts_us"))
    val purged = graft.operators.MergeOps.purgeStale(
      rib, "peer_hash_id", "ts_us", upMsgs, "hash_id", "ts_us")
      .select("hash_id").as[String].collect().toSet
    assert(purged === Set("h3")) // p1's stale routes gone, p2 kept
  }

  test("T7 router-up cascade downs only stale peers of that router") {
    val peers = Seq(
      ("p1", "rt1", "up", 100L), ("p2", "rt1", "up", 300L), ("p3", "rt2", "up", 100L))
      .toDF("hash_id", "router_hash_id", "state", "ts_us")
    val ups = Seq(("rt1", "up", 200L)).toDF("hash_id", "state", "ts_us")
    val out = Ingest.routerUpCascade(peers, ups)
      .select("hash_id", "state").as[(String, String)].collect().toMap
    assert(out === Map("p1" -> "down", "p2" -> "up", "p3" -> "up"))
  }

  test("T8 collector cascade downs stale routers of that collector") {
    val routers = Seq(
      ("rt1", "ch1", "up", 100L), ("rt2", "ch1", "up", 300L), ("rt3", "ch2", "up", 100L))
      .toDF("hash_id", "collector_hash_id", "state", "ts_us")
    val evs = Seq(("ch1", "stopped", 200L)).toDF("hash_id", "action", "ts_us")
    val out = Ingest.collectorCascade(routers, evs)
      .select("hash_id", "state").as[(String, String)].collect().toMap
    assert(out === Map("rt1" -> "down", "rt2" -> "up", "rt3" -> "up"))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Enrichment

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("geo_ip CSV loads with numeric prefix ranges incl /0 defaults") {
    val dir = Files.createTempDirectory("graft_geo")
    val csv = dir.resolve("geo.csv")
    Files.writeString(csv, Seq(
      "4,0.0.0.0/0,ZZ,,,0.0,0.0,0.0,UTC,default",
      "6,::/0,ZZ,,,0.0,0.0,0.0,UTC,default6",
      "4,10.0.0.0/8,US,WA,Seattle,47.6,-122.3,-8.0,PST,acme").mkString("\n"))
    val geo = Enrichment.loadGeoIpCsv(spark, csv.toString)
    assert(geo.count() === 3)
    // LPM over the table always matches thanks to the /0 rows
    val probe = graft.ip.IpKit.ipNumUdf(lit("10.1.2.3"))
    val hits = geo.filter(col("ip_family") === 4 &&
        probe >= col("ip_start") && probe <= col("ip_end"))
      .select("ip").as[String].collect().toSet
    assert(hits === Set("0.0.0.0/0", "10.0.0.0/8"))
  }

  test("rpki JSON export parses roas with AS-prefix strip") {
    val dir = Files.createTempDirectory("graft_rpki")
    val json = dir.resolve("export.json")
    Files.writeString(json,
      """{"roas":[{"asn":"AS65001","prefix":"10.0.0.0/8","maxLength":24},
        |{"asn":"65002","prefix":"2001:db8::/32","maxLength":48}]}""".stripMargin)
    val roas = Enrichment.loadRpkiJson(spark, json.toString)
    val got = roas.select("origin_as", "prefix", "prefix_len", "prefix_len_max")
      .as[(Long, String, Int, Int)].collect().toSet
    assert(got === Set((65001L, "10.0.0.0/8", 8, 24), (65002L, "2001:db8::/32", 32, 48)))
  }

  test("info_route staging: DISTINCT ON (prefix, origin_as) first-wins (M12)") {
    val staged = Seq(
      ("10.0.0.0/8", 65001L, "zzz-last"), ("10.0.0.0/8", 65001L, "aaa-first"),
      ("10.1.0.0/16", 65002L, "only"))
      .toDF("prefix", "origin_as", "descr")
    val got = Enrichment.distinctRoutes(staged)
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("10.0.0.0/8", 65001L, "zzz-last"), ("10.1.0.0/16", 65002L, "only")))
  }

  test("pdb_exchange_peers JSON loads and refresh-merges on the IX key (M14)") {
    val dir = Files.createTempDirectory("graft_pdb")
    val json = dir.resolve("ixpeers.json")
    Files.writeString(json, Seq(
      """{"ix_id":1,"ix_name":"TestIX","peer_ipv4":"206.1.1.1","peer_ipv6":"2001:504::1","rs_peer":true,"peer_name":"net-a","peer_asn":65001,"speed":10000,"policy":"Open","ix_city":"Seattle","ix_country":"US","ix_region":"NA","ts_us":100}""",
      """{"ix_id":1,"ix_name":"TestIX","peer_ipv4":"206.1.1.2","peer_asn":65002,"speed":1000,"ts_us":100}""",
      """{"ix_name":"NoKey"}""").mkString("\n"))
    val loaded = Enrichment.loadPdbIxPeersJson(spark, json.toString)
    // NULL-key row dropped; missing ip columns normalized to '' so the
    // (ix_id, peer_ipv4, peer_ipv6) PK always upserts
    assert(loaded.count() === 2)
    assert(loaded.filter(col("peer_ipv6") === "").count() === 1)

    val refresh = Seq((1L, "206.1.1.1", "2001:504::1", 65001L, 100000L, 200L))
      .toDF("ix_id", "peer_ipv4", "peer_ipv6", "peer_asn", "speed", "ts_us")
    val current = loaded.select("ix_id", "peer_ipv4", "peer_ipv6", "peer_asn",
      "speed", "ts_us")
    val merged = Enrichment.mergePdbIxPeers(current, refresh)
      .select("peer_ipv4", "speed").as[(String, Long)].collect().toMap
    assert(merged === Map("206.1.1.1" -> 100000L, "206.1.1.2" -> 1000L))
  }

  test("info_asn merge: peeringdb overwrites, whois fills gaps (M13)") {
    val whois = Seq((1L, "w-one", "whois"), (2L, "w-two", "whois"))
      .toDF("asn", "as_name", "source")
    val pdb = Seq((2L, "p-two", "peeringdb")).toDF("asn", "as_name", "source")
    val merged = Enrichment.mergeInfoAsn(whois, pdb)
      .as[(Long, String, String)].collect().toSet
    assert(merged === Set((1L, "w-one", "whois"), (2L, "p-two", "peeringdb")))
  }
}

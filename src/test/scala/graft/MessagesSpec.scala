package graft

import org.apache.spark.sql.functions._

import graft.model.Messages

/** S2/S3: TSV envelope parse + cell coercions for the bus message types
  * (field orders per FIXTURES.md §A / the reference Query classes).
  */
class MessagesSpec extends SparkSpec {
  import spark.implicits._

  test("unicast_prefix TSV parse with coercions and len>128 drop") {
    val lines = Seq(
      // hash, peer, attr, v4, origin, prefix, len, ts, withdrawn, path, labels, prepolicy, adjin
      "h1\tp1\ta1\t1\t65001\t10.0.0.0\t8\t2024-01-01 00:00:01.123456\tfalse\t0\t\t1\t1",
      "h2\tp1\t\t1\t\t10.1.0.0\t16\t2024-01-01 00:00:02.000000\ttrue\t0\t\t1\t1",
      "h3\tp1\ta1\t0\t65002\t2001:db8::\t200\t2024-01-01 00:00:03.000000\tfalse\t0\t\t1\t1")
      .toDF("line")
    val parsed = Messages.unicastPrefixFromTsv(lines)
    assert(parsed.count() === 2) // len 200 dropped (UnicastPrefixQuery.java:50-51)
    val h1 = parsed.filter(col("hash_id") === "h1").head()
    assert(h1.getAs[Long]("origin_as") === 65001L)
    assert(h1.getAs[Boolean]("isWithdrawn") === false)
    assert(h1.getAs[Long]("ts_us") === 1704067201123456L)
    val h2 = parsed.filter(col("hash_id") === "h2").head()
    assert(h2.getAs[Long]("origin_as") === 0L) // empty → 0 coercion
    assert(h2.getAs[Boolean]("isWithdrawn") === true)
  }

  test("base_attribute arrays from space-delimited cells") {
    val line = Seq(Seq(
      "a1", "p1", "igp", "65001 65002 65003", "65003", "10.0.0.1", "0", "100",
      "0", "", "65001:100 65001:200", "", "", "", "", "3", "1",
      "2024-01-01 00:00:01.000000").mkString("\t")).toDF("line")
    val r = Messages.baseAttributeFromTsv(line).head()
    assert(r.getAs[Seq[Long]]("as_path") === Seq(65001L, 65002L, 65003L))
    assert(r.getAs[Seq[String]]("community_list") === Seq("65001:100", "65001:200"))
    assert(r.getAs[Seq[String]]("cluster_list") === Seq.empty)
    assert(r.getAs[Int]("as_path_count") === 3)
  }

  test("peer action → state mapping (PeerQuery.java:59-64)") {
    def mk(action: String) = Seq((Seq("ph", "rh", "", "1", "10.0.0.9", "peer9",
      "10.0.0.9", "65009", action) ++ Seq.fill(19)("")).mkString("\t")).toDF("line")
    assert(Messages.peerFromTsv(mk("first")).head().getAs[String]("state") === "up")
    assert(Messages.peerFromTsv(mk("up")).head().getAs[String]("state") === "up")
    assert(Messages.peerFromTsv(mk("down")).head().getAs[String]("state") === "down")
  }

  test("l3vpn parse: unicast fields + rd + ext communities") {
    val line = Seq(Seq("h9", "p1", "a1", "1", "65001", "10.0.0.0", "8",
      "2024-01-01 00:00:01.000000", "false", "0", "", "1", "1",
      "65001:100", "rt:65001:1 rt:65001:2").mkString("\t")).toDF("line")
    val r = Messages.l3vpnFromTsv(line).head()
    assert(r.getAs[String]("rd") === "65001:100")
    assert(r.getAs[Seq[String]]("ext_community_list") === Seq("rt:65001:1", "rt:65001:2"))
  }

  test("ls_node parse validates protocol enum; ls_prefix validates route type") {
    def node(proto: String) = Seq(Seq("h1", "p1", "a1", "5", "65001", "0",
      "0102.0304.0506", "0", proto, "10.0.0.1", "49.0001", "", "node1", "0",
      "", "false", "2024-01-01 00:00:01.000000").mkString("\t")).toDF("line")
    assert(Messages.lsNodeFromTsv(node("IS-IS_L2")).head().getAs[String]("protocol")
      === "IS-IS_L2")
    assert(Messages.lsNodeFromTsv(node("BOGUS")).head().getAs[String]("protocol") === "")
    assert(Messages.lsNodeFromTsv(node("IS-IS_L2")).head().getAs[Long]("seq") === 5L)
  }

  test("router action term → down; collector stopped → down") {
    def mkR(action: String) = Seq((Seq("rh", "r1", "10.0.0.1",
      "2024-01-01 00:00:01.000000", action) ++ Seq.fill(7)("")).mkString("\t")).toDF("line")
    assert(Messages.routerFromTsv(mkR("init")).head().getAs[String]("state") === "up")
    assert(Messages.routerFromTsv(mkR("term")).head().getAs[String]("state") === "down")
    def mkC(action: String) = Seq(Seq("ch", action, "admin", "rl", "2",
      "2024-01-01 00:00:01.000000").mkString("\t")).toDF("line")
    assert(Messages.collectorFromTsv(mkC("started")).head().getAs[String]("state") === "up")
    assert(Messages.collectorFromTsv(mkC("stopped")).head().getAs[String]("state") === "down")
  }
}

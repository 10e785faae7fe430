package graft

import java.math.BigInteger

import graft.ip.IpKit

class IpKitSpec extends SparkSpec {

  test("ipToBits matches the reference's IpAddr test vector") {
    // /root/reference/src/test/java/org/openbmp/ConsumerRunnableAppTest.java:34-38
    assert(IpKit.ipToBits("10.1.1.248") === "00001010000000010000000111111000")
  }

  test("prefixRange v4") {
    val (fam, s, e) = IpKit.prefixRange("10.0.0.0/8")
    assert(fam === 4)
    assert(s === BigInteger.valueOf(10L << 24))
    assert(e === BigInteger.valueOf((11L << 24) - 1))
  }

  test("prefixRange host form defaults to full length") {
    val (_, s, e) = IpKit.prefixRange("192.168.1.5")
    assert(s === e)
  }

  test("prefixRange v6 needs >64 bits") {
    val (fam, s, e) = IpKit.prefixRange("2001:db8::/32")
    assert(fam === 6)
    assert(s.bitLength() > 64)
    assert(e.subtract(s) === BigInteger.ONE.shiftLeft(96).subtract(BigInteger.ONE))
  }

  test("binary numeric form is containment-ordered in Spark") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("10.0.0.0/8", "10.1.0.0/16", "192.168.0.0/16")
      .toDF("prefix")
    val ranged = IpKit.withPrefixRange(df, "prefix")
    val probe = IpKit.ipNumUdf(lit("10.1.2.3"))
    val hits = ranged.filter(probe >= col("ip_start") && probe <= col("ip_end"))
      .select("prefix").as[String].collect().toSet
    assert(hits === Set("10.0.0.0/8", "10.1.0.0/16"))
  }

  test("FIXTURES scenario 5: v4-mapped + /0 defaults LPM edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ::ffff:a.b.c.d is family 6 (Postgres semantics), 16-byte value
    val (fam, s6, _) = IpKit.prefixRange("::ffff:10.1.2.3")
    assert(fam === 6)
    assert(s6.bitLength() > 32 && s6.and(BigInteger.valueOf(0xffffffffL)) ===
      IpKit.ipToBigInt("10.1.2.3"))

    val geo = IpKit.withPrefixRange(
      Seq("0.0.0.0/0", "::/0", "10.0.0.0/8", "2001:db8::/32").toDF("ip"), "ip")
    def lpmOf(probe: String): String = {
      val famLit = if (probe.contains(":")) 6 else 4
      val p = IpKit.ipNumUdf(lit(probe))
      geo.filter(col("ip_family") === famLit &&
          p >= col("ip_start") && p <= col("ip_end"))
        .orderBy(col("ip_len").desc).select("ip").as[String].head()
    }
    assert(lpmOf("10.1.2.3") === "10.0.0.0/8")
    assert(lpmOf("8.8.8.8") === "0.0.0.0/0")        // default route catches
    assert(lpmOf("2001:db8::1") === "2001:db8::/32")
    assert(lpmOf("::ffff:10.1.2.3") === "::/0")      // mapped stays family 6
  }

  test("dirty address inputs: null, not loopback/crash/DNS") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      ("blank", " "),            // trims to empty — must NOT resolve loopback
      ("hostname", "localhost"), // non-literal — must NOT DNS-resolve
      ("badmask", "1.2.3.4/40"), // mask beyond family width
      ("negmask", "1.2.3.4/-1"),
      ("garbage", "not-an-ip"),
      ("good", "10.0.0.0/8"))
      .toDF("case", "p")
      .select(col("case"),
        IpKit.inetNum(col("p")).as("native"),
        IpKit.prefixStartUdf(col("p")).as("udf"))
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    for (c <- Seq("blank", "hostname", "badmask", "negmask", "garbage")) {
      assert(df(c)._1 == null, s"native inet_num('$c') should be null")
      assert(df(c)._2 == null, s"prefixStartUdf('$c') should be null")
    }
    assert(df("good")._1 != null && df("good")._2 != null)
    // scala-side parity
    intercept[IllegalArgumentException](IpKit.prefixRange("1.2.3.4/40"))
    intercept[IllegalArgumentException](IpKit.ipToBigInt("localhost"))
  }

  test("inetFamily/inetMaskLen are NULL for NULL input (Postgres family(NULL))") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("p")
      .select(IpKit.inetFamily(col("p")), IpKit.inetMaskLen(col("p"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("inetHost / inetFamily / inetMaskLen columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq("10.1.2.3/24", "2001:db8::1/64", "1.2.3.4").toDF("ip")
      .select(IpKit.inetHost(col("ip")), IpKit.inetFamily(col("ip")),
        IpKit.inetMaskLen(col("ip")))
      .as[(String, Int, Int)].collect().toSeq
    assert(r === Seq(("10.1.2.3", 4, 24), ("2001:db8::1", 6, 64), ("1.2.3.4", 4, 32)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

class InetExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("inet_* expressions work via SQL after registration (codegen path)") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT hex(inet_num('10.0.0.1')) AS n,
             hex(inet_start('10.1.0.0/16')) AS s,
             hex(inet_end('10.1.0.0/16')) AS e,
             inet_family('2001:db8::1') AS f6,
             inet_family('1.2.3.4') AS f4,
             inet_num('not-an-ip') AS bad""").head()
    assert(r.getAs[String]("n") === "0A000001")
    assert(r.getAs[String]("s") === "0A010000")
    assert(r.getAs[String]("e") === "0A01FFFF")
    assert(r.getAs[Int]("f6") === 6)
    assert(r.getAs[Int]("f4") === 4)
    assert(r.isNullAt(r.fieldIndex("bad")))
  }

  test("expression results match the UDF forms on v4+v6 prefixes") {
    GraftFunctions.register(spark)
    val ips = Seq("10.0.0.0/8", "192.168.1.5", "2001:db8::/32", "::1").toDF("ip")
    val cmp = ips.select(
      (call_function("inet_start", col("ip")) <=> graft.ip.IpKit.prefixStartUdf(col("ip"))).as("s"),
      (call_function("inet_end", col("ip")) <=> graft.ip.IpKit.prefixEndUdf(col("ip"))).as("e"))
      .agg(min(col("s")), min(col("e"))).as[(Boolean, Boolean)].head()
    assert(cmp === ((true, true)))
  }
}

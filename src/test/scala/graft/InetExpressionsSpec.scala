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

  test("inet_contains evaluates and is rewritten to range form by the rule") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT inet_contains('10.0.0.0/8', inet_num('10.1.2.3')) AS hit,
             inet_contains('10.0.0.0/8', inet_num('11.0.0.1')) AS miss,
             inet_contains('2001:db8::/32', inet_num('2001:db8::42')) AS hit6,
             inet_contains('10.0.0.0/8', inet_num('a00:1::')) AS xfam,
             inet_contains('::/0', inet_num('10.0.0.1')) AS xfam2""").head()
    assert(r.getAs[Boolean]("hit") && !r.getAs[Boolean]("miss") && r.getAs[Boolean]("hit6"))
    // mixed families never contain (Postgres >>= semantics)
    assert(!r.getAs[Boolean]("xfam") && !r.getAs[Boolean]("xfam2"))

    // the optimizer rewrites the predicate into start/end conjuncts so a
    // containment join plans over simple binary comparisons
    Seq("10.0.0.0/8", "192.168.0.0/16").toDF("pfx").createOrReplaceTempView("pfx_t")
    Seq("10.5.5.5", "192.168.3.4", "8.8.8.8").toDF("ip").createOrReplaceTempView("probe_t")
    val joined = spark.sql("""
      SELECT pfx, ip FROM probe_t JOIN pfx_t
      ON inet_contains(pfx, inet_num(ip))""")
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("inet_contains"))
    assert(optimized.contains("inetstart") || optimized.contains("InetStart")
      || optimized.contains("inet_start"))
    assert(joined.collect().map(r0 => (r0.getString(0), r0.getString(1))).toSet ===
      Set(("10.0.0.0/8", "10.5.5.5"), ("192.168.0.0/16", "192.168.3.4")))
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

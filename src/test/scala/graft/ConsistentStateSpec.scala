package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.ConsistentState

/** The MVCC-parity property ([[ConsistentState]]): a reader that
  * resolved the manifest once can never observe two tables from
  * different commits, and its pinned plans survive a concurrent commit.
  */
class ConsistentStateSpec extends SparkSpec {

  test("readConsistent pins all tables to one commit; concurrent commit cannot tear it") {
    import spark.implicits._
    val root = Files.createTempDirectory("cstate").toString

    // commit 1: rib and peers both at "generation 1" content
    val t1 = ConsistentState.begin(spark, root)
    t1.stage("ip_rib", Seq(("u1", "p1", 1)).toDF("hash_id", "peer_hash_id", "gen"))
    t1.stage("bgp_peers", Seq(("p1", 1)).toDF("hash_id", "gen"))
    t1.commit()

    // a reader opens a consistent snapshot...
    val pinned = ConsistentState.readConsistent(spark, root, Seq("ip_rib", "bgp_peers"))

    // ...while a writer commits generation 2 into BOTH tables
    val t2 = ConsistentState.begin(spark, root)
    t2.stage("ip_rib", Seq(("u1", "p1", 2), ("u2", "p1", 2)).toDF("hash_id", "peer_hash_id", "gen"))
    t2.stage("bgp_peers", Seq(("p1", 2)).toDF("hash_id", "gen"))
    t2.commit() // keepVersions=2 retains v0 → the pinned plans stay readable

    // the pinned reader still sees gen-1 EVERYWHERE — no mix of 1 and 2
    val gens = pinned("ip_rib").select("gen").as[Int].collect().toSet ++
      pinned("bgp_peers").select("gen").as[Int].collect().toSet
    assert(gens === Set(1), s"torn read: $gens")
    assert(pinned("ip_rib").count() === 1)

    // a fresh resolve sees gen-2 everywhere
    val now = ConsistentState.readConsistent(spark, root, Seq("ip_rib", "bgp_peers"))
    assert(now("ip_rib").count() === 2)
    assert(now("bgp_peers").select("gen").as[Int].collect().toSet === Set(2))
  }

  test("uncommitted staging is invisible; replayed staging converges; pruning keeps the window") {
    import spark.implicits._
    val root = Files.createTempDirectory("cstate2").toString

    val t1 = ConsistentState.begin(spark, root)
    t1.stage("t", Seq(1).toDF("x"))
    t1.commit()

    // crash model: a txn stages v1 but never commits
    val crashed = ConsistentState.begin(spark, root)
    crashed.stage("t", Seq(99).toDF("x"))
    assert(ConsistentState.readConsistent(spark, root, Seq("t"))("t")
      .as[Int].collect().toSeq === Seq(1)) // manifest untouched

    // the replayed batch re-stages the SAME version dir and commits once
    val replay = ConsistentState.begin(spark, root)
    replay.stage("t", Seq(2).toDF("x"))
    replay.commit()
    assert(ConsistentState.readConsistent(spark, root, Seq("t"))("t")
      .as[Int].collect().toSeq === Seq(2))

    // keepVersions=2: after commits v0..v2, v0 is pruned, v1 retained
    val t3 = ConsistentState.begin(spark, root)
    t3.stage("t", Seq(3).toDF("x"))
    t3.commit()
    val dirs = new java.io.File(s"$root/t").listFiles().map(_.getName).toSet
    assert(dirs === Set("v1", "v2"), s"unexpected versions: $dirs")
  }

  test("two concurrent txns on one root: the second commit refuses loudly") {
    import spark.implicits._
    val root = Files.createTempDirectory("cstate4").toString
    val t0 = ConsistentState.begin(spark, root)
    t0.stage("t", Seq(1).toDF("x"))
    t0.commit()

    // both writers open against the same committed state — the
    // single-writer misconfiguration (two apps on one root). They touch
    // DIFFERENT tables, so the damage a lost update would do is purely
    // manifest-level: b's swap would un-publish a's table version.
    val a = ConsistentState.begin(spark, root)
    val b = ConsistentState.begin(spark, root)
    a.stage("ta", Seq(2).toDF("x"))
    b.stage("tb", Seq(99).toDF("x"))
    a.commit()
    // b's manifest base is pre-a; publishing it would drop a's commit
    // from _CURRENT — it must crash, not lose data
    val e = intercept[java.util.ConcurrentModificationException] { b.commit() }
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    // a's commit survived untouched
    assert(ConsistentState.readConsistent(spark, root, Seq("ta"))("ta")
      .as[Int].collect().toSeq === Seq(2))
  }

  test("manifest swap is atomic: concurrent readers never see a missing manifest") {
    import spark.implicits._
    val root = Files.createTempDirectory("cstate3").toString
    val first = ConsistentState.begin(spark, root)
    first.stage("t", Seq(0).toDF("x"))
    first.commit()

    // a delete-then-rename swap has a window where _CURRENT is MISSING —
    // readManifest reads that as "nothing ever committed", un-publishing
    // every table at once. Hammer commits on one thread while polling the
    // manifest from another: with the atomic overwrite the reader must
    // see a non-empty manifest with monotonically advancing versions.
    @volatile var stop = false
    @volatile var torn: Option[String] = None
    val reader = new Thread(() => {
      var last = -1
      while (!stop && torn.isEmpty) {
        val man = ConsistentState.readManifest(spark, root)
        man.get("t") match {
          case None => torn = Some("manifest missing/empty mid-commit")
          case Some(v) =>
            if (v < last) torn = Some(s"version went backwards: $last -> $v")
            last = v
        }
      }
    })
    reader.start()
    try {
      (1 to 60).foreach { i =>
        val txn = ConsistentState.begin(spark, root)
        txn.stage("t", Seq(i).toDF("x"))
        txn.commit()
      }
    } finally { stop = true; reader.join(10000) }
    assert(torn.isEmpty, torn.getOrElse(""))
  }
}

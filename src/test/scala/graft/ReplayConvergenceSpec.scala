package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.operators.MergeOps
import graft.operators.MergeOps.MergePolicy

/** SURVEY §5.2: replay convergence — the reference's correctness story
  * is at-least-once delivery + idempotent keyed upserts (`Config.java:
  * 264-279` + §2.2). The precise properties (batch compression per
  * `WriterRunnable.java:140-153` intentionally drops intra-batch
  * intermediates, so batching DOES affect retained attrs — exactly as
  * in the reference):
  *
  *  1. singleton batches ≡ one-pass ordered fold (applyOrdered parity);
  *  2. within-batch arrival order is irrelevant (the writer's map keyed
  *     by hash makes it so; here dedupToLatest does);
  *  3. replaying the whole sequence again (at-least-once redelivery)
  *     converges to the same final state.
  */
class ReplayConvergenceSpec extends SparkSpec {
  import spark.implicits._

  val policy = MergePolicy(
    keys = Seq("k"), withdrawnCol = "wd", orderBy = Seq("ts", "seq"),
    retainOnWithdraw = Seq("attr"), alwaysUpdate = Seq("ts", "seq"))

  type U = (String, Long, Long, String, Boolean) // k, ts, seq, attr, wd

  private def toDf(us: Seq[U]): DataFrame = us.toDF("k", "ts", "seq", "attr", "wd")

  private def applyBatches(batches: Seq[Seq[U]]): Set[(String, Long, Boolean, String)] =
    batches
      .foldLeft(toDf(Nil).limit(0)) { (cur, b) =>
        MergeOps.upsert(cur, MergeOps.dedupToLatest(toDf(b), policy.keys, policy.orderBy), policy)
      }
      .select("k", "ts", "wd", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
      .toSet

  test("replay convergence properties (seeded random sequences)") {
    val rnd = new Random(7)
    for (round <- 1 to 3) {
      val updates: Seq[U] = (for {
        k <- 1 to 6
        t <- 1 to rnd.between(2, 8)
      } yield (s"k$k", t.toLong, (k * 100 + t).toLong,
        if (rnd.nextBoolean()) s"a$k-$t" else null,
        // k6: ALL withdraws — a key never advertised exercises the
        // first-update fallback of applyOrdered (upsert writes the
        // first withdraw's incoming attrs; the fold must match)
        k == 6 || rnd.nextInt(4) == 0)).toSeq

      // 1. singleton batches ≡ applyOrdered one-pass fold
      val canonical = MergeOps.applyOrdered(toDf(updates), policy)
        .select("k", "ts", "wd", "attr")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
        .toSet
      assert(applyBatches(updates.map(Seq(_))) === canonical,
        s"round $round: singleton batches != one-pass fold")

      // 2. within-batch arrival order is irrelevant
      val batches  = updates.grouped(rnd.between(2, 6)).toSeq
      val batched  = applyBatches(batches)
      val shuffled = applyBatches(batches.map(b => rnd.shuffle(b)))
      assert(shuffled === batched, s"round $round: within-batch order mattered")

      // 3. at-least-once: replaying the whole sequence again converges
      assert(applyBatches(batches ++ batches) === batched,
        s"round $round: full re-replay diverged")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Throughput sanity for the FastLevenshtein static kernel (not a
  * correctness gate — correctness lives in TextFnsSpec).
  */
class KernelMicrobench extends AnyFunSuite {
  test("FastLevenshtein.dist throughput on 300-char pairs") {
    val rnd = new scala.util.Random(7)
    def doc() = UTF8String.fromString(
      (1 to 60).map(_ => "abcdefghij"(rnd.nextInt(10))).mkString(" ") * 5)
    val pairs = Array.fill(2000)((doc(), doc()))
    // warm JIT
    var s = 0L
    for (_ <- 1 to 2; (a, b) <- pairs) s += graft.plans.FastLevenshtein.dist(a, b, -1)
    val t0 = System.nanoTime()
    for ((a, b) <- pairs) s += graft.plans.FastLevenshtein.dist(a, b, -1)
    val el = (System.nanoTime() - t0) / 1e9
    val cells = pairs.map(p => p._1.numChars().toLong * p._2.numChars()).sum
    info(f"unbounded: ${cells / el / 1e6}%.0f M cells/s single-thread ($s)")
    val t1 = System.nanoTime()
    for ((a, b) <- pairs) s += graft.plans.FastLevenshtein.dist(a, b, 210)
    val el1 = (System.nanoTime() - t1) / 1e9
    info(f"thr=210:   ${cells / el1 / 1e6}%.0f M cells/s single-thread ($s)")
    assert(s != 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{TopKBuf, TopKLongBuf, TopKTermsBuf}

/** The heap buffer against a brute-force sort reference: the retained
  * set must be the unique k best under (score DESC, id ASC), for any
  * insertion order, including score ties, duplicate-score runs, and
  * under-full buffers. Deterministic pseudo-random orders (fixed LCG —
  * no Random seed ambiguity). */
class TopKBufSpec extends AnyFunSuite {

  private def ref(pairs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    pairs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def viaBuf(pairs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] = {
    val b = new TopKBuf(k)
    pairs.foreach { case (s, i) => b.add(s, i) }
    b.sortedPairs().toSeq
  }

  test("heap top-k equals sort-based reference across orders, ties, and sizes") {
    var lcg = 12345L
    def next(): Long = { lcg = lcg * 6364136223846793005L + 1442695040888963407L; lcg }
    for (k <- Seq(1, 3, 10, 100); n <- Seq(0, 1, k - 1, k, k + 1, 5 * k)) {
      val pairs = (0 until math.max(n, 0)).map { j =>
        // coarse score grid forces plenty of exact ties -> id tiebreak
        ((math.floorMod(next(), 7L)).toDouble / 2.0, math.floorMod(next(), 1000L))
      }
      assert(viaBuf(pairs, k) == ref(pairs, k), s"k=$k n=$n")
    }
  }

  test("insertion order cannot change the retained set") {
    val pairs = (0 until 500).map(j => ((j % 9).toDouble, (j * 31 % 500).toLong))
    val k = 37
    val asc = viaBuf(pairs.sortBy(p => (p._1, p._2)), k)
    val desc = viaBuf(pairs.sortBy(p => (-p._1, -p._2)), k)
    val mixed = viaBuf(pairs, k)
    assert(asc == desc && desc == mixed && mixed == ref(pairs, k))
  }

  // ------------------------------------------------------- long-scored

  private def refL(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def viaLongBuf(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    val b = new TopKLongBuf(k)
    pairs.foreach { case (s, i) => b.add(s, i) }
    b.sortedPairs().toSeq
  }

  test("long-scored heap equals sort reference, incl. values past 2^53") {
    var lcg = 777L
    def next(): Long = { lcg = lcg * 6364136223846793005L + 1442695040888963407L; lcg }
    for (k <- Seq(1, 5, 40); n <- Seq(0, k, 4 * k)) {
      // big base puts scores past 2^53 where doubles could not tell
      // adjacent values apart — the exact-ranking case this buffer is for
      val base = (1L << 53) + 10
      val pairs = (0 until n).map { _ =>
        (base + math.floorMod(next(), 5L), math.floorMod(next(), 300L))
      }
      assert(viaLongBuf(pairs, k) == refL(pairs, k), s"k=$k n=$n")
      assert(viaLongBuf(pairs.sortBy(p => (p._1, p._2)), k) ==
        viaLongBuf(pairs.sortBy(p => (-p._1, -p._2)), k), s"order k=$k n=$n")
    }
  }

  test("adjacent >2^53 longs that collapse in double stay distinct here") {
    val a = (1L << 53) + 1 // rounds DOWN to exactly 2^53 in double
    val b = 1L << 53
    assert(a.toDouble == b.toDouble) // the failure mode being retired
    assert(viaLongBuf(Seq((a, 2L), (b, 1L)), 1) == Seq((a, 2L)))
    assert(viaLongBuf(Seq((b, 1L), (a, 2L)), 1) == Seq((a, 2L)))
  }

  // ------------------------------------------------------------- terms

  private def refT(rows: Seq[(Long, String, Long, Long)], k: Int) =
    rows.sortBy { case (s, t, _, _) => (-s, t) }.take(k)
      .map { case (s, t, a, b) => (t, s, a, b) }

  private def viaTermsBuf(rows: Seq[(Long, String, Long, Long)], k: Int) = {
    val buf = new TopKTermsBuf(k)
    rows.foreach { case (s, t, a, b) =>
      buf.add(s, UTF8String.fromString(t), a, b)
    }
    buf.sortedIdx().toSeq.map(i =>
      (buf.terms(i).toString, buf.scores(i), buf.tfs(i), buf.dfs(i)))
  }

  test("terms heap: (score DESC, term ASC) retained set is order-independent") {
    var lcg = 4242L
    def next(): Long = { lcg = lcg * 6364136223846793005L + 1442695040888963407L; lcg }
    for (k <- Seq(1, 5, 16); n <- Seq(0, k - 1, k, 6 * k)) {
      val rows = (0 until math.max(n, 0)).map { j =>
        // coarse scores force score ties -> term ASC tie-break;
        // distinct terms per group (the postings invariant)
        (math.floorMod(next(), 4L), f"tok $j%04d w", j.toLong, math.floorMod(next(), 9L))
      }
      assert(viaTermsBuf(rows, k) == refT(rows, k), s"k=$k n=$n")
      assert(viaTermsBuf(rows.reverse, k) == viaTermsBuf(rows, k), s"rev k=$k n=$n")
    }
  }
}

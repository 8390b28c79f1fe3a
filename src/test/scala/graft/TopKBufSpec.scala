package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKBuf

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
}

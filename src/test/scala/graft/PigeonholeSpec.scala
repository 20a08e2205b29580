package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Unit evidence for the adaptive pigeonhole blocking helpers behind
  * q152/q214: the EXACTNESS property (any pair within Hamming k
  * shares at least one leave-k-out masked value, at every block
  * count) is what lets those queries resize blocks with N without
  * touching their all-pairs oracles.
  */
class PigeonholeSpec extends AnyFunSuite {

  private def choose(n: Int, k: Int): Long =
    (0 until k).map(i => (n - i).toLong).product /
      (1 to k).map(_.toLong).product

  test("masks: C(blocks, k) masks, each zeroing exactly k equal blocks") {
    for ((bits, blocks, k) <- Seq((32, 2, 1), (32, 4, 1), (32, 8, 1),
        (32, 16, 1), (60, 4, 3), (60, 5, 3), (60, 6, 3), (60, 10, 3),
        (64, 4, 3), (64, 8, 3))) {
      val masks = Dedup.pigeonholeMasks(bits, blocks, k)
      assert(masks.size === choose(blocks, k), s"($bits,$blocks,$k)")
      assert(masks.distinct.size === masks.size, "masks must be distinct")
      val bw = bits / blocks
      val full = if (bits == 64) -1L else (1L << bits) - 1
      masks.foreach { m =>
        assert((m & ~full) === 0L, "mask must stay inside the fingerprint")
        // zeroed region = exactly k whole blocks
        val zeroedBits = java.lang.Long.bitCount(full & ~m)
        assert(zeroedBits === k * bw, s"mask $m zeroes $zeroedBits bits")
        val wholeBlocks = (0 until blocks).count { j =>
          val bm = ((1L << bw) - 1) << (j * bw)
          (m & bm) == 0L
        }
        assert(wholeBlocks === k, "zeroed region must align to blocks")
      }
    }
  }

  test("exactness: every pair within Hamming k shares a masked value (exhaustive-ish)") {
    val rnd = new scala.util.Random(42)
    for ((bits, blocks, k) <- Seq((32, 4, 1), (32, 8, 1), (60, 5, 3), (60, 6, 3))) {
      val masks = Dedup.pigeonholeMasks(bits, blocks, k)
      (0 until 500).foreach { _ =>
        val a = rnd.nextLong() & ((1L << bits) - 1)
        // flip up to k random bits
        val flips = rnd.nextInt(k) + 1
        val b = (0 until flips).foldLeft(a)((v, _) => v ^ (1L << rnd.nextInt(bits)))
        assert(masks.exists(m => (a & m) == (b & m)),
          s"pair within hamming $flips missed by all masks ($bits,$blocks,$k)")
      }
    }
  }

  test("blocksFor: resolves to the documented widths at the fixture scales") {
    // q152: 32 bits, k=1, choices {2,4,8,16} (widths 16/24/28/30)
    val c152 = Seq(2, 4, 8, 16)
    assert(Dedup.pigeonholeBlocksFor(500L, 32, 1, c152) === 2)
    assert(Dedup.pigeonholeBlocksFor(5000L, 32, 1, c152) === 2)
    assert(Dedup.pigeonholeBlocksFor(50000L, 32, 1, c152) === 4)
    assert(Dedup.pigeonholeBlocksFor(1L << 22, 32, 1, c152) === 8)
    assert(Dedup.pigeonholeBlocksFor(1L << 26, 32, 1, c152) === 16)
    assert(Dedup.pigeonholeBlocksFor(1L << 40, 32, 1, c152) === 16,
      "past the 30-bit cap the largest split holds (64-bit fingerprint is the next move)")
    // q214: 60 bits, k=3, choices {4,5,6,10} (widths 15/24/30/42)
    val c214 = Seq(4, 5, 6, 10)
    assert(Dedup.pigeonholeBlocksFor(540L, 60, 3, c214) === 4)
    assert(Dedup.pigeonholeBlocksFor(5385L, 60, 3, c214) === 5)
    assert(Dedup.pigeonholeBlocksFor(53847L, 60, 3, c214) === 5)
    assert(Dedup.pigeonholeBlocksFor(1L << 22, 60, 3, c214) === 6)
    assert(Dedup.pigeonholeBlocksFor(1L << 27, 60, 3, c214) === 10)
  }
}

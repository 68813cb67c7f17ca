package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Codec-stage unit checks for the multimodal family (the query surface is
  * oracle-gated; these pin the FakeCodec bit math directly). */
class MultimodalSpec extends AnyFunSuite {

  import Multimodal.FakeCodec

  test("aHash keeps the sign bit clear (compares as signed Long everywhere)") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val p = Array.fill(1 + rnd.nextInt(400))(rnd.nextInt(256).toByte)
      assert(FakeCodec.aHash(p) >= 0L)
    }
  }

  test("aHash is a pure function of the payload bytes") {
    val p = "spark near dup payload".getBytes("UTF-8")
    assert(FakeCodec.aHash(p) === FakeCodec.aHash(p.clone()))
  }

  test("aHash edge values: empty and uniform payloads hash to 0") {
    assert(FakeCodec.aHash(Array.emptyByteArray) === 0L)
    // uniform bytes: every block sum equals the mean — no bit strictly above
    assert(FakeCodec.aHash(Array.fill(16)('a'.toByte)) === 0L)
  }

  test("aHash matches the hand-computed ramp payload") {
    // bytes 0..255: block b sums to 16b+6, total 32640; (16i+6)*64 > 32640
    // iff i >= 32 -> bits 32..62 set
    val ramp = Array.tabulate(256)(_.toByte)
    assert(FakeCodec.aHash(ramp) === 0x7FFFFFFF00000000L)
  }

  test("a one-byte corruption moves few bits (near-dup stays within Hamming radius)") {
    val p = "the quick brown fox jumps over the lazy dog and keeps going".getBytes("UTF-8")
    val q = p.clone(); q(3) = (q(3) + 1).toByte
    val d = java.lang.Long.bitCount(FakeCodec.aHash(p) ^ FakeCodec.aHash(q))
    assert(d <= 3, s"hamming $d after a single-byte edit")
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2.AppendFlowControl

class AppendFlowControlSpec extends AnyFunSuite {

  test("oversized payloads pay the rate once, not twice") {
    AppendFlowControl.reset()
    val b = AppendFlowControl.bucket("/tmp/store", "oversize/test", 10000L)
    val t0 = System.nanoTime()
    // 3 × 15 KB against a 10 KB/s bucket with a 10 KB burst:
    // correct pacing = (45000 − 10000 − ending debt 5000) / 10000 ≈ 3 s.
    // The old sleep-full-deficit-then-book-debt path paid the over-
    // capacity slice twice (~4 s) — effective throughput ~67% of spec.
    b.acquire(15000L); b.acquire(15000L); b.acquire(15000L)
    val sec = (System.nanoTime() - t0) * 1e-9
    assert(sec > 2.5 && sec < 3.7,
      s"expected ~3s of pacing (once-charged), got ${sec}s")
    AppendFlowControl.reset()
  }

  test("sustained sub-capacity stream holds the configured rate") {
    AppendFlowControl.reset()
    val b = AppendFlowControl.bucket("/tmp/store", "steady/test", 20000L)
    val t0 = System.nanoTime()
    (1 to 40).foreach(_ => b.acquire(1000L)) // 40 KB at 20 KB/s, 20 KB burst
    val sec = (System.nanoTime() - t0) * 1e-9
    assert(sec > 0.7 && sec < 1.6, s"expected ~1s of pacing, got ${sec}s")
    // Same-named journal in a DIFFERENT store must get its own bucket.
    assert(!(AppendFlowControl.bucket("/tmp/store", "steady/test", 20000L)
      eq AppendFlowControl.bucket("/tmp/other", "steady/test", 20000L)),
      "same-named journals in different stores must not share a throttle")
    AppendFlowControl.reset()
  }
}

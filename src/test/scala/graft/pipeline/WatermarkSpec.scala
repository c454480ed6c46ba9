package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import WindowTestKit._

/** Ports of /root/reference/lib/wallaroo/core/windows/_test_watermark.pony
  * (185 LoC): min-of-upstreams propagation + idle-upstream eviction, plus
  * the pane-parameter/expansion vectors from
  * _test_expand_sliding_window.pony (110 LoC). */
class WatermarkSpec extends AnyFunSuite {

  test("TimeoutTriggerWatermark: silent upstream is evicted") {
    val w = new StageWatermarks(seconds(10))
    val inputWm = w.receiveWatermark(1, seconds(1), seconds(2))
    assert(inputWm == seconds(1))
    assert(w.checkEffectiveInputWatermark(seconds(2) + seconds(12)) == TimeoutWatermark.value)
  }

  test("StageWatermarks: min-of-upstreams with eviction") {
    val w = new StageWatermarks(seconds(100))
    // No upstream data yet: effective watermark is max (trigger everything)
    assert(w.checkEffectiveInputWatermark(seconds(200)) == TimeoutWatermark.value)

    assert(w.receiveWatermark(1, seconds(10), seconds(210)) == seconds(10))
    assert(w.checkEffectiveInputWatermark(seconds(210)) == seconds(10))
    // u3 behind: watermark can't move backwards
    assert(w.receiveWatermark(3, seconds(5), seconds(220)) == seconds(10))
    // u2 ahead: can't advance past effective minimum
    assert(w.receiveWatermark(2, seconds(15), seconds(230)) == seconds(10))
    assert(w.updateOutputWatermark(seconds(10))._1 == seconds(10))
    // u3 advances but u1 still holds us back
    assert(w.receiveWatermark(3, seconds(16), seconds(235)) == seconds(10))
    // u1 jumps ahead: u2 becomes the effective minimum
    assert(w.receiveWatermark(1, seconds(20), seconds(240)) == seconds(15))
    assert(w.updateOutputWatermark(seconds(15))._1 == seconds(15))
    // u2 silent past the threshold → evicted, advance to u3
    assert(w.checkEffectiveInputWatermark(seconds(331)) == seconds(16))
    // u3 silent past the threshold → u1 is the effective minimum
    assert(w.receiveWatermark(2, seconds(25), seconds(336)) == seconds(20))
    // Output watermark never goes backwards
    assert(w.updateOutputWatermark(seconds(1))._1 == seconds(15))
    // u3 advances and is the new minimum
    assert(w.receiveWatermark(3, seconds(21), seconds(340)) == seconds(21))
    assert(w.updateOutputWatermark(seconds(21))._1 == seconds(21))
    // Repeated checks within threshold leave the watermark unchanged
    w.checkEffectiveInputWatermark(seconds(341))
    w.checkEffectiveInputWatermark(seconds(342))
    assert(w.checkEffectiveInputWatermark(seconds(343)) == seconds(21))
  }

  test("pane expansion counts match _TestExpandSlidingWindow") {
    // range 10s, slide 2s, delay 1s → 6 panes of 2s, 1 pane per slide.
    // Expansion is exercised through the public apply path: an event at
    // `eventTs` beyond the covered end grows the ring to cover it.
    def expandedBy(eventTsMs: Long): Int = {
      val sw = new PanesRangeWindows[Long, Long, WindowTestKit.Total]("key",
        Sum, seconds(10), seconds(2), seconds(1), LateDataPolicy.Drop,
        seconds(88) + seconds(2), 0.0) // earliest pane starts at 88s, end 99.999..s
      sw(1, millis(eventTsMs), 0)
      sw.paneCount - 6
    }
    assert(expandedBy(100000) == 1)
    assert(expandedBy(101999) == 1)
    assert(expandedBy(102000) == 2)
    assert(expandedBy(103000) == 2)
    assert(expandedBy(108999) == 5)
    assert(expandedBy(115000) == 8)
    assert(expandedBy(199999) == 50)
    assert(expandedBy(1010000) == 456)
  }
}

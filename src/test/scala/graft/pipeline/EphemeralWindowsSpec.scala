package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import WindowTestKit._

/** Ports of /root/reference/lib/wallaroo/core/windows/
  * _test_ephemeral_windows.pony (373 LoC). trigger_range = post_trigger
  * range = 5 s throughout, matching the Pony suite. */
class EphemeralWindowsSpec extends AnyFunSuite {
  private def ew() = ephemeralWrapper(Collect, seconds(5), seconds(5))

  test("FirstMessageForOpenWindowIsPlacedInWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(100))
    assert(outs(res) == Vector(Vector(1L)))
  }

  test("MessageBeforeTriggerPointForOpenWindowIsPlacedInWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w(2, seconds(104), seconds(111))
    assert(outs(res) == Vector(Vector(1L, 2L)))
  }

  test("FirstMessageAfterTriggerPointIsPlacedInWindowAndWindowIsTriggered") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w(2, seconds(106), seconds(106))
    assert(outs(res) == Vector(Vector(1L, 2L)))
  }

  test("MessageForExistingButTriggeredWindowIsTreatedAsDropLateData") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    val res = w(3, seconds(107), seconds(107))
    assert(outs(res).isEmpty)
  }

  test("MessageForExistingButTriggeredWindowIsTreatedAsFirePerMessageLateData") {
    val w = ephemeralWrapper(Collect, seconds(5), seconds(5),
      policy = LateDataPolicy.FirePerMessage)
    w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    val res = w(3, seconds(107), seconds(107))
    assert(outs(res) == Vector(Vector(3L)))
  }

  test("KeyIsRetainedForFirstMessage") {
    val w = ew()
    assert(w(1, seconds(100), seconds(100))._3)
  }

  test("KeyIsRetainedForMessageBeforeTriggerPoint") {
    val w = ew(); w(1, seconds(100), seconds(100))
    assert(w(2, seconds(103), seconds(103))._3)
  }

  test("KeyIsRetainedForTriggeredWindowBeforeRemovePoint") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    assert(w(2, seconds(107), seconds(107))._3)
  }

  test("KeyIsNotRetainedForTriggeredWindowAfterRemovePoint") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    assert(!w(2, seconds(111), seconds(111))._3)
  }

  test("OnTimeoutBeforeTriggerPointDoesNothing") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(104), seconds(100))
    assert(outs(res).isEmpty && res._3)
  }

  test("OnTimeoutNonTriggeredWindowAfterTriggerPointTriggersWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(106), seconds(100))
    assert(outs(res) == Vector(Vector(1L)) && res._3)
  }

  test("OnTimeoutTriggeredWindowAfterTriggerPointDoesNothing") {
    val w = ew(); w(1, seconds(100), seconds(100))
    w.onTimeout(seconds(106), seconds(100))
    val res = w.onTimeout(seconds(108), seconds(106))
    assert(outs(res).isEmpty && res._3)
  }

  test("OnTimeoutNonTriggeredWindowAfterRemovePointTriggersWindowAndRemoves") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(100))
    assert(outs(res) == Vector(Vector(1L)) && !res._3)
  }

  test("OnTimeoutTriggeredWindowAfterRemovePointRemoves") {
    val w = ew(); w(1, seconds(100), seconds(100))
    w.onTimeout(seconds(106), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(106))
    assert(outs(res).isEmpty && !res._3)
  }

  test("PlaceInOldestWindowIsRejected") {
    assertThrows[IllegalArgumentException] {
      ephemeralWrapper(Collect, seconds(5), seconds(5),
        policy = LateDataPolicy.PlaceInOldestWindow)(1, seconds(100), seconds(100))
    }
  }
}

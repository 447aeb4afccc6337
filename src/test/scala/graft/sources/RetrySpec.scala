package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures with doubling, capped delays") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Retry.withBackoff(maxRetries = 5, baseDelayMs = 100,
      maxDelayMs = 300, sleep = delays.append(_)) {
      calls += 1
      if (calls < 4) throw new RuntimeException("rate limited")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 4)
    assert(delays.toSeq === Seq(100L, 200L, 300L))  // doubled, then capped
  }

  test("exhausted retries rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 2, baseDelayMs = 1, sleep = _ => ()) {
        calls += 1
        throw new RuntimeException(s"fail $calls")
      }
    }
    assert(calls === 3)
    assert(e.getMessage === "fail 3")
  }

  test("non-retryable failures are not retried") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withBackoff(maxRetries = 5, sleep = _ => (),
        retryOn = { case _: RuntimeException => false; case _ => true }) {
        calls += 1
        throw new IllegalStateException("fatal")
      }
    }
    assert(calls === 1)
  }
}

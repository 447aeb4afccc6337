package graft.sources

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Driver-side ingestion retry with exponential backoff — the
  * reference's rate-limit handling (reference:
  * extract_stripe_data.py:62-102: per-item retry ≤ 50, delay 2^(n-1)
  * seconds, all-or-nothing; README.md:106-108). Not a Spark operator:
  * source fetch happens on the driver (or inside a DSv2 reader), and
  * this wraps it.
  *
  * @param maxRetries   attempts after the first (reference: 50)
  * @param baseDelayMs  first retry delay; doubles each attempt
  * @param maxDelayMs   backoff cap so attempt 50 is not 2^49 seconds
  * @param retryOn      which failures are retryable (default: all)
  */
object Retry {
  def withBackoff[A](maxRetries: Int = 50,
                     baseDelayMs: Long = 1000L,
                     maxDelayMs: Long = 60000L,
                     sleep: Long => Unit = Thread.sleep,
                     retryOn: Throwable => Boolean = _ => true)(op: => A): A = {
    @tailrec
    def loop(attempt: Int): A = Try(op) match {
      case Success(a) => a
      case Failure(e) if attempt < maxRetries && retryOn(e) =>
        // cap the shift BEFORE applying it: baseDelayMs << 54 overflows
        // Long to a negative, and Thread.sleep(negative) throws —
        // turning attempt ~54 of a 50+-retry contract into a spurious
        // IllegalArgumentException instead of the op's real failure
        val exp = math.min(attempt, 20)
        sleep(math.min(baseDelayMs << exp, maxDelayMs))
        loop(attempt + 1)
      case Failure(e) => throw e
    }
    loop(0)
  }
}

package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpecBase {
  import spark.implicits._

  private def counts(text: String, pats: Seq[String]): Seq[Long] =
    Seq(Option(text)).toDF("t")
      .select(Blocklist.matchCounts(col("t"), pats).as("c"))
      .as[Option[Seq[Long]]].head().map(_.toSeq).getOrElse(null)

  test("counts every occurrence of every pattern, including shared-text overlaps") {
    assert(counts("he said hello to her", Seq("he", "hello", "her")) ===
      Seq(3L, 1L, 1L)) // "he" inside "hello" and "her" counts
    assert(counts("ababab", Seq("ab", "ba")) === Seq(3L, 2L))
  }

  test("self-overlapping pattern counts every end position") {
    // "aa" in "aaaa" ends at positions 1,2,3 — the all-occurrences
    // contract (regex non-overlapping would say 2)
    assert(counts("aaaa", Seq("aa")) === Seq(3L))
  }

  test("patterns sharing prefixes and one being a prefix of another both fire") {
    assert(counts("abcd abce abc", Seq("abc", "abcd", "abce")) ===
      Seq(3L, 1L, 1L))
  }

  test("no match, empty text, and NULL text") {
    assert(counts("nothing here", Seq("absent")) === Seq(0L))
    assert(counts("", Seq("absent")) === Seq(0L))
    assert(counts(null, Seq("x")) === null) // null in, null out
  }

  test("multi-byte UTF-8 patterns match exactly") {
    assert(counts("naïve café naïve", Seq("naïve", "café", "ï")) ===
      Seq(2L, 1L, 2L))
  }

  test("matches agree with a naive scan on random inputs") {
    val pats = Seq("ab", "bc", "abc", "ca", "aa", "cab")
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => "abc" (rnd.nextInt(3))).mkString
      val expected = pats.map { p =>
        (0 to s.length - p.length).count(i => s.startsWith(p, i)).toLong
      }
      assert(counts(s, pats) === expected, s"text '$s'")
    }
  }

  test("compile rejects empty and duplicate patterns") {
    intercept[IllegalArgumentException](Blocklist.compile(Nil))
    intercept[IllegalArgumentException](Blocklist.compile(Seq("a", "")))
    intercept[IllegalArgumentException](Blocklist.compile(Seq("a", "a")))
  }
}

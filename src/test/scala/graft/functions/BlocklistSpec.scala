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
    intercept[IllegalArgumentException](Blocklist.compileSparse(Seq("a", "a")))
  }

  private def countsOf(a: Blocklist.Ac, text: String): Seq[Long] =
    a.count(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      .toLongArray().toSeq

  test("sparse automaton matches the dense automaton on random patterns and texts") {
    val rnd = new scala.util.Random(11)
    (1 to 30).foreach { round =>
      val nPats = 1 + rnd.nextInt(8)
      val pats = Iterator.continually(
        (1 to (1 + rnd.nextInt(5))).map(_ => "abï" (rnd.nextInt(3))).mkString)
        .distinct.take(nPats).toSeq
      val dense = Blocklist.compile(pats)
      val sparse = Blocklist.compileSparse(pats)
      (1 to 10).foreach { _ =>
        val text = (1 to rnd.nextInt(60)).map(_ => "abï" (rnd.nextInt(3))).mkString
        assert(countsOf(sparse, text) === countsOf(dense, text),
          s"round $round pats $pats text '$text'")
      }
    }
  }

  test("sparse: fail-chain suffix matches and overlaps count identically") {
    val pats = Seq("he", "hello", "her", "ab", "ba", "aa", "abc")
    val dense = Blocklist.compile(pats)
    val sparse = Blocklist.compileSparse(pats)
    for (t <- Seq("he said hello to her", "ababab", "aaaa", "abcabc", ""))
      assert(countsOf(sparse, t) === countsOf(dense, t), s"text '$t'")
  }

  test("compileAuto picks sparse past the dense byte limit; counts stay identical") {
    // a synthetic 10k-phrase blocklist: far past DenseByteLimit
    val pats = (0 until 10000).map(i => s"phrase${i}x")
    val auto = Blocklist.compileAuto(pats)
    assert(auto.isInstanceOf[Blocklist.SparseAutomaton],
      s"expected sparse for ${pats.map(_.length).sum} pattern bytes")
    val sparse = auto.asInstanceOf[Blocklist.SparseAutomaton]
    // sparse footprint: one transition per trie edge, not 256
    assert(sparse.numStates > 10000)
    val text = "phrase42x and phrase9999x and phrase42xphrase43x"
    val got = countsOf(auto, text)
    assert(got(42) === 2L && got(9999) === 1L && got(43) === 1L)
    assert(got.sum === 4L)
    // small lists stay dense (the per-byte-lookup fast path)
    assert(Blocklist.compileAuto(Seq("a", "b"))
      .isInstanceOf[Blocklist.Automaton])
  }

  test("Spark surface uses compileAuto: large-list counts via the expression") {
    val pats = (0 until 2000).map(i => s"tok${i}q")
    val got = Seq("tok5q tok1999q tok5q").toDF("t")
      .select(Blocklist.matchCounts(col("t"), pats).as("c"))
      .as[Seq[Long]].head()
    assert(got(5) === 2L && got(1999) === 1L && got.sum === 3L)
  }
}

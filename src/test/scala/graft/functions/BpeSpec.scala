package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("trainFromCounts reproduces the hand-computed merge sequence") {
    // Sennrich-style corpus. Pair counts, worked by hand:
    //   round 1: (e,s)=9 ties (s,t)=9 → lexicographic → es
    //   round 2: (es,t)=9 → est
    //   round 3: (l,o)=7 ties (o,w)=7 → lo
    //   round 4: (lo,w)=7 → low
    //   round 5: (e,w)=6 ties (n,e)=6,(w,est)=6 → ew
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainFromCounts(counts, numMerges = 5)
    assert(merges === Seq("e" -> "s", "es" -> "t", "l" -> "o",
      "lo" -> "w", "e" -> "w"))
  }

  test("trainFromCounts stops at minPairCount instead of merging hapax pairs") {
    val merges = Bpe.trainFromCounts(Seq(("ab", 1L), ("cd", 1L)), numMerges = 10)
    assert(merges.isEmpty) // every pair occurs once; default floor is 2
    val forced = Bpe.trainFromCounts(Seq(("ab", 1L), ("cd", 1L)),
      numMerges = 10, minPairCount = 1)
    assert(forced === Seq("a" -> "b", "c" -> "d")) // then no pairs remain
  }

  test("train learns from a DataFrame corpus, deterministically") {
    val docs = Seq.fill(3)("low lower newest newest widest").toDF("text")
    val m1 = Bpe.train(docs, "text", numMerges = 3)
    // same relative frequencies as the hand-worked histogram up to
    // scaling, so the first merges must match round 1-2 above
    assert(m1.take(2) === Seq("e" -> "s", "es" -> "t"))
    assert(m1 === Bpe.train(docs, "text", numMerges = 3)) // repeatable
  }

  test("encodeWord: lowest rank wins over textual order") {
    val m = Bpe.Model(Seq("b" -> "c", "a" -> "b"))
    assert(Bpe.encodeWord("abc", m).toSeq === Seq("a", "bc"))
  }

  test("encodeWord: a merge can enable a later-rank merge") {
    val m = Bpe.Model(Seq("a" -> "b", "ab" -> "c"))
    assert(Bpe.encodeWord("aabcb", m).toSeq === Seq("a", "abc", "b"))
    assert(Bpe.encodeWord("cab", m).toSeq === Seq("c", "ab"))
  }

  test("encodeWord with DemoMerges: english words segment as expected") {
    val m = Bpe.Model(Bpe.DemoMerges)
    assert(Bpe.encodeWord("the", m).toSeq === Seq("the"))
    assert(Bpe.encodeWord("thinking", m).toSeq === Seq("th", "in", "k", "ing"))
    assert(Bpe.encodeWord("and", m).toSeq === Seq("and"))
    assert(Bpe.encodeWord("zz", m).toSeq === Seq("z", "z"))
    assert(Bpe.encodeWord("", m).toSeq === Seq.empty)
  }

  test("encode column flattens word segmentations in order") {
    val out = Seq("The cat and the dog").toDF("t")
      .select(Bpe.encode(TextFunctions.tokens($"t"), Bpe.DemoMerges).as("b"))
      .as[Seq[String]].head()
    assert(out === Seq("the", "c", "at", "and", "the", "d", "o", "g"))
    val n = Seq("The cat and the dog").toDF("t")
      .select(Bpe.tokenCount(TextFunctions.tokens($"t"), Bpe.DemoMerges))
      .as[Int].head()
    assert(n === 8)
  }

  test("encode matches encodeWord across a corpus (codegen path = scala path)") {
    val docs = Seq("thinking about the weather", "stonewalled estates",
      "a2b2 mixed 42 tokens", "").toDF("t")
    val viaExpr = docs
      .select(Bpe.encode(TextFunctions.tokens($"t"), Bpe.DemoMerges).as("b"))
      .as[Seq[String]].collect()
    val m = Bpe.Model(Bpe.DemoMerges)
    val viaScala = docs.select(TextFunctions.tokens($"t")).as[Seq[String]]
      .collect()
      .map(_.flatMap(w => Bpe.encodeWord(w, m)))
    assert(viaExpr.toSeq === viaScala.toSeq)
  }
}

package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SketchExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("minhash_signature: deterministic, identical inputs → identical sigs") {
    val df = Seq(
      Seq("a b", "b c", "c d"),
      Seq("a b", "b c", "c d"),
      Seq("x y", "y z", "z w")
    ).toDF("sh").select(Sketches.minhash_signature($"sh", 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
    assert(sigs(0).length === 16)
  }

  test("minhash estimate approximates true jaccard for overlapping sets") {
    // sets share 50 of 100 shingles → true J = 50/150 ≈ 0.333
    val a = (0 until 100).map(i => s"sh$i")
    val b = (50 until 150).map(i => s"sh$i")
    val est = Seq((a, b)).toDF("a", "b")
      .select(Sketches.sig_agreement(
        Sketches.minhash_signature($"a", 256),
        Sketches.minhash_signature($"b", 256))).as[Double].head()
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"estimate $est too far from 0.333")
  }

  test("simhash64: near-identical token sets land at small hamming distance") {
    val base = (0 until 60).map(i => s"tok$i")
    val near = base.drop(2) ++ Seq("other1", "other2")
    val far = (0 until 60).map(i => s"zzz$i")
    val sigs = Seq(base, near, far).toDF("t")
      .select(Sketches.simhash64($"t")).as[Long].collect()
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(sigs(0), sigs(1)) < hamming(sigs(0), sigs(2)))
  }

  test("expressions survive both codegen and interpreted paths") {
    val df = Seq(Seq("a", "b")).toDF("t")
    // forcing interpreted evaluation via filter on the expression result
    val viaEval = df.select(Sketches.simhash64($"t").as("s"))
      .filter($"s" =!= 0L).count()
    assert(viaEval === 1)
  }

  test("SQL registration exposes the expressions to spark.sql") {
    SqlFunctions.registerAll(spark)
    Seq(("a b c d", "a b c x")).toDF("t1", "t2").createOrReplaceTempView("sqlfn_t")
    val row = spark.sql(
      """SELECT graft_jaccard(split(t1, ' '), split(t2, ' ')) AS j,
        |       graft_simhash(split(t1, ' ')) AS sh,
        |       size(graft_minhash(split(t1, ' '), 8)) AS mh,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos
        |FROM sqlfn_t""".stripMargin).head()
    assert(row.getDouble(0) === 0.6)  // |{a,b,c}| / |{a,b,c,d,x}|
    assert(row.getLong(1) !== 0L)
    assert(row.getInt(2) === 8)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)
    // more of the registered set (GraftExtensions mirrors the same
    // functions for SQL-first deployments)
    val row2 = spark.sql(
      """SELECT graft_sig_agreement(graft_minhash(split(t1, ' '), 8),
        |                           graft_minhash(split(t1, ' '), 8)) AS agree,
        |       size(graft_token_set(split(t1, ' '))) AS ntok
        |FROM sqlfn_t""".stripMargin).head()
    assert(row2.getDouble(0) === 1.0)
    assert(row2.getInt(1) === 4)
    val row3 = spark.sql(
      """SELECT graft_containment(graft_token_set(split(t1, ' ')),
        |                         graft_token_set(split(t2, ' '))) AS c,
        |       size(graft_ngrams(split(t1, ' '), 2)) AS ng,
        |       graft_top_freq_fraction(split(t1, ' ')) AS tf,
        |       graft_token_counts(split(t1, ' '))['a'] AS ca
        |FROM sqlfn_t""".stripMargin).head()
    assert(row3.getDouble(0) === 0.75) // {a,b,c,d} ∩ {a,b,c,x} / 4
    assert(row3.getInt(1) === 3)
    assert(row3.getDouble(2) === 0.25)
    assert(row3.getLong(3) === 1L)
    val row4 = spark.sql(
      """SELECT graft_nfc('café') AS n,
        |       graft_blocklist_counts('he said hello', 'he', 'hello') AS bc
        |FROM sqlfn_t""".stripMargin).head()
    assert(row4.getString(0) === "café")
    assert(row4.getSeq[Long](1) === Seq(2L, 1L))
  }

  test("word_ngrams: shingle semantics (dedup, whole-doc fallback)") {
    val out = Seq(
      Seq("a", "b", "a", "b", "c"), // 3-grams: "a b a","b a b","a b c"
      Seq("a", "b"),                // shorter than n → whole doc
      Seq.empty[String]             // empty doc → one empty gram
    ).toDF("t")
      .select(Sketches.word_ngrams($"t", 3, dedup = true, emptyIfShort = false))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b a", "b a b", "a b c"))
    assert(out(1) === Seq("a b"))
    assert(out(2) === Seq(""))
    // dedup keeps first occurrence only
    val dup = Seq(Seq("x", "y", "x", "y")).toDF("t")
      .select(Sketches.word_ngrams($"t", 2, dedup = true, emptyIfShort = false))
      .as[Seq[String]].head()
    assert(dup === Seq("x y", "y x"))
  }

  test("word_ngrams: bigram semantics (multiset, empty-if-short)") {
    val out = Seq(
      Seq("a", "b", "a", "b"), // bigrams: a b, b a, a b (duplicates kept)
      Seq("solo"),
      Seq.empty[String]
    ).toDF("t")
      .select(Sketches.word_ngrams($"t", 2, dedup = false, emptyIfShort = true))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b", "b a", "a b"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("top_freq_fraction: hash-count pass matches expectations incl. ties") {
    val out = Seq(
      Seq("a", "b", "a", "a"),     // a: 3/4
      Seq("x", "y"),               // tie → 1/2
      Seq.empty[String]            // empty → 0.0
    ).toDF("t").select(Sketches.top_freq_fraction($"t")).as[Double].collect()
    assert(out(0) === 0.75)
    assert(out(1) === 0.5)
    assert(out(2) === 0.0)
  }

  test("token_counts: per-row term-frequency map") {
    val out = Seq(Seq("a", "b", "a", "c", "a"), Seq.empty[String]).toDF("t")
      .select(Sketches.token_counts($"t"))
      .as[Map[String, Long]].collect()
    assert(out(0) === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(out(1) === Map.empty)
  }

  test("null inputs propagate as null") {
    val df = Seq((Option.empty[Seq[String]], Option.empty[Seq[Float]]))
      .toDF("t", "v")
    val r = df.select(
      Sketches.simhash64($"t").isNull,
      Sketches.minhash_signature($"t", 4).isNull,
      Sketches.cosine_f($"v", $"v").isNull).as[(Boolean, Boolean, Boolean)].head()
    assert(r === ((true, true, true)))
  }
}

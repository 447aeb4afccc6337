package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark common"),
    (2L, "duck duck common"),
    (3L, "goose common")
  ).toDF("doc_id", "text")

  test("tfidfTopTerms ranks rare repeated terms above ubiquitous ones") {
    val out = Relevance.tfidfTopTerms(corpus, "doc_id", "text", k = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Double)].collect()
    // 'common' appears in every doc → idf = ln(4/4) = 0; each doc's
    // distinctive term must win
    assert(out.map(r => (r._1, r._2)) === Array((1L, "spark"), (2L, "duck"), (3L, "goose")))
    // doc 1: tf=3, df=1 → score = 3 · ln(4/2) = 3 ln 2
    assert(out(0)._3 === 3L && out(0)._4 === 1L)
    assert(math.abs(out(0)._5 - BigDecimal(3 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("a term present in every document scores exactly zero") {
    val scores = Relevance.tfidfTopTerms(corpus, "doc_id", "text", k = 10)
      .filter(col("term") === "common")
      .select("score").as[Double].collect()
    assert(scores.length === 3 && scores.forall(_ === 0.0))
  }

  test("k bounds the per-document output and ties break by term") {
    val tied = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Relevance.tfidfTopTerms(tied, "doc_id", "text", k = 2)
      .orderBy("term").select("term").as[String].collect()
    // all three terms have identical tf/df → alphabetical tiebreak keeps
    // the first two
    assert(out === Array("alpha", "beta"))
  }

  test("vocabCoverage: top-V membership, OOV ratios, zero-token docs persist") {
    val docs = Seq(
      (1L, "cat cat cat dog"),   // cat(3)+dog: both in vocab of 2
      (2L, "cat bird"),          // bird is OOV → 0.5
      (3L, "emu bird emu bird"), // all OOV → 1.0
      (4L, "")                   // zero tokens → 0 / 0.0, kept
    ).toDF("doc_id", "text")
    // corpus counts: cat 4, bird 3, emu 2, dog 1 → vocab(2) = {bird, cat}
    val out = Relevance.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out === Array(
      (1L, 4L, 0.25),  // dog OOV
      (2L, 2L, 0.0),
      (3L, 4L, 0.5),   // emu OOV, bird covered
      (4L, 0L, 0.0)), s"got ${out.mkString("; ")}")
  }

  test("vocabCoverage: vocab tie at the cut breaks by token, deterministically") {
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "zz")).toDF("doc_id", "text")
    // counts: aa 2, bb 2, zz 1 → vocab(1) must pick aa (count desc, token asc)
    val out = Relevance.vocabCoverage(docs, "doc_id", "text", vocabSize = 1)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out === Array((1L, 2L, 0.5), (2L, 2L, 0.5), (3L, 1L, 1.0)))
  }

  test("qualityFilter: each check fails for the doc built to fail it, reasons are named") {
    val sentence = "the cat sat on the mat and the dog ran to the park "
    // c1("the") = 160 in the trained model, so an unseen the-bigram
    // scores ln(0.1/161) ≈ -7.38 — just past the -7.0 lm floor
    val train = Seq((100L, (sentence * 40).trim)).toDF("doc_id", "text")
    val fluent = (sentence * 3).trim // 39 tokens, all bigrams in-model
    val docs = Seq(
      (1L, fluent),                                   // passes everything
      (2L, "too short"),                              // length (repetition is length-gated)
      (3L, fluent + " " + ("!@#$%^&*()" * 40)),       // alpha
      (4L, ("the the the the the " * 8).trim),        // repetition + lm ("the the" unseen)
      (5L, ("zq wx kj vb mn pq rs tu vw xy " * 3).trim) // lang; lm SURVIVES smoothing:
        // unseen history backs off to ln(1/V) ≈ -2.3, far above the floor
    ).toDF("doc_id", "text")
    val out = Relevance.qualityFilter(docs, train, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect()
    assert(out(0) === ((1L, true, "")), s"got ${out.mkString("; ")}")
    assert(!out(1)._2 && out(1)._3.contains("length"))
    assert(!out(1)._3.contains("repetition")) // one-bigram doc: no verdict
    assert(!out(2)._2 && out(2)._3 === "alpha")
    // fixed report order: reasons list follows check order, not alphabetical
    assert(!out(3)._2 && out(3)._3 === "repetition,lm")
    assert(!out(4)._2 && out(4)._3 === "lang")
  }

  test("bigramLmScore: closed-form smoothed probabilities, short docs score NULL") {
    val train = Seq(
      (10L, "the cat sat"),       // bigrams: "the cat", "cat sat"
      (11L, "the cat ran")        // bigrams: "the cat", "cat ran"
    ).toDF("doc_id", "text")
    // model: c2("the cat")=2, c2("cat sat")=1, c2("cat ran")=1
    //        c1("the")=2, c1("cat")=2; V = |{the,cat,sat,ran}| = 4
    val score = Seq(
      (1L, "the cat sat"),        // seen bigrams
      (2L, "the dog"),            // unseen bigram, seen history "the"
      (3L, "dog emu"),            // unseen bigram, unseen history
      (4L, "one"),                // 1 token → no bigrams
      (5L, "")                    // 0 tokens → no bigrams
    ).toDF("doc_id", "text")
    val a = 0.1
    val v = 4.0
    def p(c2: Long, c1: Long) = (c2 + a) / (c1 + a * v)
    val out = Relevance.bigramLmScore(train, score, "doc_id", "text", alpha = a)
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) === ((1L, 2L,
      Some(r6((math.log(p(2, 2)) + math.log(p(1, 2))) / 2)))))
    assert(out(1) === ((2L, 1L, Some(r6(math.log(p(0, 2)))))))
    assert(out(2) === ((3L, 1L, Some(r6(math.log(p(0, 0)))))))
    assert(out(3) === ((4L, 0L, None)))
    assert(out(4) === ((5L, 0L, None)))
    // the fluent doc outranks the unseen-vocab doc
    assert(out(0)._3.get > out(2)._3.get)
  }

  // --------------------------------------------------- postings store

  private val retrievalCorpus = Seq(
    (1L, "spark join join merge window"),
    (2L, "join merge merge duck pond"),
    (3L, "window window spark goose"),
    (4L, "pond goose duck duck"),
    (5L, "join window merge spark spark"),
    (6L, ""),                         // zero tokens: stats-only doc
    (7L, "merge join")
  ).toDF("doc_id", "text")

  private def probeVsDirect(path: String, terms: Seq[String],
                            full: org.apache.spark.sql.DataFrame): Unit = {
    val direct = Relevance.bm25TopDocs(full, "doc_id", "text", terms, k = 10)
      .as[(Long, Int, Double)].collect().toSeq
    val probe = Relevance.bm25IndexProbe(spark, path, "doc_id", "text",
      terms, k = 10).as[(Long, Int, Double)].collect().toSeq
    assert(probe === direct,
      s"probe $probe != direct $direct for terms $terms")
  }

  test("bm25 store: probe over base+epoch is bit-identical to the full-corpus scan") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25").toString + "/store"
    val base = retrievalCorpus.filter(col("doc_id") % 2 === 0)
    val batch = retrievalCorpus.filter(col("doc_id") % 2 === 1)
    Relevance.bm25IndexWrite(base, root, "doc_id", "text")
    Relevance.bm25IndexAppend(spark, root, batch, "doc_id", "text", "day-2")
    probeVsDirect(root, Seq("join", "window"), retrievalCorpus)
    // a term absent from the corpus contributes zero, never crashes
    probeVsDirect(root, Seq("join", "zebra"), retrievalCorpus)
  }

  test("bm25 store: compaction preserves the probe; Maintenance dispatches the fold") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25c").toString + "/store"
    Relevance.bm25IndexWrite(
      retrievalCorpus.filter(col("doc_id") <= 3), root, "doc_id", "text")
    Relevance.bm25IndexAppend(spark, root,
      retrievalCorpus.filter(col("doc_id") > 3), "doc_id", "text", "day-2")
    val before = Relevance.bm25IndexProbe(spark, root, "doc_id", "text",
      Seq("merge", "spark"), k = 10).as[(Long, Int, Double)].collect().toSeq
    val stats = Maintenance.compactStore(spark, root)
    assert(stats.folded.toSet === Set("base", "day-2"))
    val after = Relevance.bm25IndexProbe(spark, root, "doc_id", "text",
      Seq("merge", "spark"), k = 10).as[(Long, Int, Double)].collect().toSeq
    assert(after === before)
    probeVsDirect(root, Seq("merge", "spark"), retrievalCorpus)
  }

  test("rrfFuse: closed-form contributions, missing ids score one-sided, ties break by id") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Relevance.rrfFuse(Seq(a, b), "doc_id", k = 10, rrfK = 60)
      .as[(Long, Int, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 ranked by both lists must fuse highest
    assert(got.head === ((20L, 2, r9(1.0 / 62 + 1.0 / 61))))
    assert(got.map(_._1) === Seq(20L, 10L, 40L, 30L))
    assert(got.find(_._1 == 10L).get._3 === r9(1.0 / 61))
    assert(got.forall(r => if (r._1 == 20L) r._2 == 2 else r._2 == 1))
  }

  test("bm25IndexProbeMulti: decimal-summed scores match a closed-form replay") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25mq").toString + "/store"
    Relevance.bm25IndexWrite(retrievalCorpus, root, "doc_id", "text")
    val queries = Seq((0L, Seq("join", "window")), (1L, Seq("merge")))
      .toDF("query_id", "terms")
    val got = Relevance.bm25IndexProbeMulti(spark, root, "doc_id", "text",
      queries, k = 3).as[(Long, Long, Int, Double)].collect().toSeq
      .sortBy(t => (t._1, -t._4, t._2))

    // closed-form replay of the engine's arithmetic
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val corpus = Seq(1L -> "spark join join merge window",
      2L -> "join merge merge duck pond", 3L -> "window window spark goose",
      4L -> "pond goose duck duck", 5L -> "join window merge spark spark",
      6L -> "", 7L -> "merge join")
    val n = corpus.size.toDouble
    val dl = corpus.map { case (d, t) => d -> toks(t).length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n
    def tf(d: Long, t: String) = toks(corpus.find(_._1 == d).get._2)
      .count(_ == t).toLong
    def df(t: String) = corpus.count { case (d, _) => tf(d, t) > 0 }.toDouble
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    def contrib(d: Long, t: String): BigDecimal = {
      val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
      r(idf * (tf(d, t) * 2.2) /
        (tf(d, t) + 1.2 * (1.0 - 0.75 + 0.75 * dl(d) / avgdl)), 9)
    }
    val want = Seq(0L -> Seq("join", "window"), 1L -> Seq("merge")).flatMap {
      case (qid, ts) =>
        corpus.map(_._1)
          .map(d => (d, ts.filter(t => tf(d, t) > 0)))
          .filter(_._2.nonEmpty)
          .map { case (d, matched) =>
            (qid, d, matched.size,
              r(matched.map(t => contrib(d, t)).sum.toDouble, 6).toDouble)
          }
          .sortBy(t => (-t._4, t._2)).take(3)
    }
    assert(got === want, s"got $got want $want")
  }

  test("rrfFuseGrouped: per-query fusion, bounded top-k, closed-form scores") {
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 20L, 1L), (1L, 40L, 1L), (1L, 30L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Relevance.rrfFuseGrouped(Seq(a, b), "query_id", "doc_id",
      k = 2).as[(Long, Long, Int, Double)].collect().toSeq
      .sortBy(t => (t._1, -t._4, t._2))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (0L, 20L, 2, r9(1.0 / 62 + 1.0 / 61)),
      (0L, 10L, 1, r9(1.0 / 61)),
      (1L, 30L, 2, r9(1.0 / 61 + 1.0 / 62)),
      (1L, 40L, 1, r9(1.0 / 61))))
  }

  test("bm25 store: mismatched build columns refuse loudly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25m").toString + "/store"
    Relevance.bm25IndexWrite(retrievalCorpus, root, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Relevance.bm25IndexProbe(spark, root, "doc_id", "body", Seq("join"))
    }
    assert(e.getMessage.contains("cols"), e.getMessage)
  }

  test("rankingMetrics: hand-computed nDCG/MRR, unlabeled = 0, no-relevant query = 0s") {
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // q1: relevant docs 10 (rank 1) and 30 (rank 3); one judged doc 99 unretrieved
    // q2: relevant doc 20 at rank 2 only
    // q3: nothing relevant anywhere
    val ranked = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1), (2L, 20L, 2), (2L, 30L, 3),
      (3L, 10L, 1), (3L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val labels = Seq(
      (1L, 10L, 1.0), (1L, 30L, 1.0), (1L, 99L, 1.0),
      (2L, 20L, 1.0)).toDF("query_id", "doc_id", "rel")
    val got = Relevance.rankingMetrics(ranked, labels, k = 3)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val dcg1 = 1.0 / lg2(2) + 1.0 / lg2(4)
    val idcg1 = 1.0 / lg2(2) + 1.0 / lg2(3) + 1.0 / lg2(4) // 3 judged docs
    val exp1 = BigDecimal(dcg1 / idcg1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal((1.0 / lg2(3)) / (1.0 / lg2(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Array(
      (1L, exp1, 1.0),       // first relevant at rank 1
      (2L, exp2, 0.5),       // first relevant at rank 2
      (3L, 0.0, 0.0)))       // nothing relevant: both metrics zero
    // k truncation: with k = 1, q1's rank-3 hit stops counting
    val k1 = Relevance.rankingMetrics(ranked, labels, k = 1)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(k1.head === ((1L, 1.0, 1.0))) // dcg = idcg = 1/log2(2)
  }

  test("rankingMetrics: a judged query the ranker returned nothing for scores (0,0), not absence") {
    // q9 is judged but the ranker produced ZERO rows for it — the
    // total-failure case. A left join would drop it and macro-averaging
    // would overstate the retriever; the full-outer contract keeps it.
    val ranked = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val labels = Seq(
      (1L, 10L, 1.0), (9L, 77L, 1.0)).toDF("query_id", "doc_id", "rel")
    val got = Relevance.rankingMetrics(ranked, labels, k = 3)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got === Array(
      (1L, 1.0, 1.0),
      (9L, 0.0, 0.0))) // present, scored zero — not silently missing
  }
}

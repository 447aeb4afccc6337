package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  test("qualityBuckets: per-group quantile cuts, boundary value goes to the lower bucket") {
    // group a: scores 1..9 → c(1/3) ≈ 3.67, c(2/3) ≈ 6.33;
    // group b is shifted by 100 — per-group calibration means its
    // low scores still spread over all three buckets
    val scores = ((1 to 9).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 9).map(i => ("b", 100L + i, 100.0 + i)))
      .toDF("source", "doc_id", "score")
    val out = Quality.qualityBuckets(scores, "score", Seq("source"))
      .select("source", "doc_id", "bucket")
      .as[(String, Long, String)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    for ((g, off) <- Seq(("a", 0L), ("b", 100L))) {
      assert(Seq(1L, 2L, 3L).forall(i => out((g, off + i)) == "head"))
      assert(Seq(4L, 5L, 6L).forall(i => out((g, off + i)) == "middle"))
      assert(Seq(7L, 8L, 9L).forall(i => out((g, off + i)) == "tail"))
    }
    // exact-cut boundary: with scores 1..4, c(1/3) = 2.0 exactly —
    // score 2.0 lands in head (<= is the CCNet convention)
    val exact = (1 to 4).map(i => ("a", i.toLong, i.toDouble))
      .toDF("source", "doc_id", "score")
    val eb = Quality.qualityBuckets(exact, "score", Seq("source"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(eb(2L) === "head")
  }

  test("qualityBuckets: null scores get null buckets; bad cuts/labels are rejected") {
    val scores = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)),
      ("a", 3L, None)).toDF("source", "doc_id", "score")
    val out = Quality.qualityBuckets(scores, "score", Seq("source"),
      cuts = Seq(0.5), labels = Seq("keep", "drop"))
      .select("doc_id", "bucket").as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("keep"))
    assert(out(2L) === Some("drop"))
    assert(out(3L) === None)
    intercept[IllegalArgumentException] {
      Quality.qualityBuckets(scores, "score", Seq("source"),
        cuts = Seq(0.7, 0.3), labels = Seq("x", "y", "z"))
    }
    intercept[IllegalArgumentException] {
      Quality.qualityBuckets(scores, "score", Seq("source"),
        cuts = Seq(0.5), labels = Seq("only"))
    }
  }

  test("gateReasons: failed checks named in order, null outcome fails, all-pass keeps") {
    val df = Seq(
      (1L, Some(10.0), true),   // passes both
      (2L, Some(1.0), true),    // fails "score"
      (3L, None, true),         // null score outcome → fails "score"
      (4L, Some(10.0), false)   // fails "flag"
    ).toDF("id", "s", "f")
    val out = Quality.gateReasons(df, Seq(
        "score" -> (col("s") >= 5.0), "flag" -> col("f")))
      .select("id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect()
      .map { case (id, k, r) => id -> ((k, r)) }.toMap
    val m = out
    assert(m(1L) === ((true, "")))
    assert(m(2L) === ((false, "score")))
    assert(m(3L) === ((false, "score")))
    assert(m(4L) === ((false, "flag")))
  }

  test("frozen calibration: stored cuts ≡ inline, batch mix never shifts thresholds, manifest refuses mixups") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-qcuts").toString + "/store"
    val calib = ((1 to 9).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 9).map(i => ("b", 100L + i, 100.0 + i)))
      .toDF("source", "doc_id", "score")
    val cuts = Quality.qualityCuts(calib, "score", Seq("source"))
    val v1 = Quality.qualityCutsWrite(spark, root, cuts, "score", Seq("source"))
    val stored = Quality.qualityCutsRead(spark, root, "score", Seq("source"))
    assert(stored.orderBy("source").as[(String, Double, Double)].collect()
      === cuts.orderBy("source").as[(String, Double, Double)].collect())
    // a batch whose mix is ALL high scores: frozen cuts still label it
    // tail — per-batch recalibration would have relabeled a third head
    val batch = (7 to 9).map(i => ("a", 200L + i, i.toDouble))
      .toDF("source", "doc_id", "score")
    val got = Quality.qualityBucketsWith(batch, "score", Seq("source"), stored)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got.values.toSet === Set("tail"),
      s"frozen thresholds moved with the batch: $got")
    // an uncalibrated source is unknowable, not head
    val foreign = Seq(("zz", 1L, 5.0)).toDF("source", "doc_id", "score")
    val nb = Quality.qualityBucketsWith(foreign, "score", Seq("source"), stored)
      .select("bucket").as[Option[String]].head()
    assert(nb.isEmpty, s"uncalibrated source bucketed: $nb")
    // a second freeze supersedes atomically (new version name)
    val v2 = Quality.qualityCutsWrite(spark, root,
      Quality.qualityCuts(calib.filter($"source" === "a"), "score",
        Seq("source")), "score", Seq("source"))
    assert(v2 > v1)
    assert(Quality.qualityCutsRead(spark, root, "score", Seq("source"))
      .count() === 1L)
    // scoring a batch against a calibration frozen for a DIFFERENT
    // score column refuses loudly — the mixup the manifest exists for
    val e = intercept[IllegalArgumentException] {
      Quality.qualityCutsRead(spark, root, "ppl", Seq("source"))
    }
    assert(e.getMessage.toLowerCase.contains("meta") ||
      e.getMessage.contains("score"), e.getMessage)
    // RE-FREEZING under changed parameters refuses BEFORE any data
    // lands — regression: a write-if-absent manifest used to publish
    // the new thresholds behind the stale contract, so later
    // manifest-checked reads silently returned wrong-quantile cuts
    val e2 = intercept[IllegalArgumentException] {
      Quality.qualityCutsWrite(spark, root,
        Quality.qualityCuts(calib, "score", Seq("source"),
          cuts = Seq(0.25, 0.75)),
        "score", Seq("source"), cuts = Seq(0.25, 0.75))
    }
    assert(e2.getMessage.contains("one calibration contract"),
      e2.getMessage)
    // and the live version is still the ORIGINAL contract's table
    assert(Quality.qualityCutsRead(spark, root, "score", Seq("source"))
      .count() === 1L)
    // the maintenance sweep treats the snapshot family as the benign
    // nothing-to-compact skip, never a failure
    val swept = Maintenance.compactAll(spark,
      root.stripSuffix("/store"))
    assert(swept.exists(r => r.family == Quality.CutsFamily && !r.failed))
  }
}

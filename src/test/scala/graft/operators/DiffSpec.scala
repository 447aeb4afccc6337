package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpecBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")
  private val newSnap = Seq(
    (1L, "a", 10.0),   // unchanged
    (2L, "B", 20.0),   // s changed
    (3L, "c", 31.0),   // v changed
    (5L, "e", 50.0)    // added; 4 removed
  ).toDF("k", "s", "v")

  test("snapshotDiff names adds, removes and per-column changes") {
    val got = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq(
      (2L, "changed", "s"), (3L, "changed", "v"),
      (4L, "removed", ""), (5L, "added", "")))
  }

  test("includeUnchanged surfaces identical rows; multi-change lists all columns") {
    val multi = Seq((2L, "X", 99.0)).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(oldSnap.filter(col("k") === 2), multi,
      Seq("k"), includeUnchanged = true)
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((2L, "changed", "s,v")))
    val same = Diff.snapshotDiff(oldSnap, oldSnap, Seq("k"),
      includeUnchanged = true)
      .as[(Long, String, String)].collect().toSeq
    assert(same.forall(_._2 == "unchanged") && same.size === 4)
  }

  test("NULL-to-value and value-to-NULL edits are changes; NULL==NULL is not") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("k", "s")
    val n = Seq((1L, Some("y")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val got = Diff.snapshotDiff(o, n, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "changed", "s"), (2L, "changed", "s")))
  }

  test("NULL keys refuse loudly instead of mis-diffing") {
    val bad = Seq((Option.empty[Long], "x", 1.0), (Some(1L), "a", 10.0))
      .toDF("k", "s", "v")
    val e = intercept[Exception] {
      Diff.snapshotDiff(bad, newSnap, Seq("k")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL key"),
      s"got: ${e.getMessage}")
  }

  test("snapshotDiffKeys matches the full diff's change set on the narrow shuffle") {
    val full = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .select("k", "change").as[(Long, String)].collect().toSet
    val narrow = Diff.snapshotDiffKeys(oldSnap, newSnap, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(narrow === full)
    // value→NULL flips the fingerprint (null disambiguation)
    val o = Seq((1L, Some("x"))).toDF("k", "s")
    val n = Seq((1L, Option.empty[String])).toDF("k", "s")
    assert(Diff.snapshotDiffKeys(o, n, Seq("k"))
      .as[(Long, String)].collect().toSeq === Seq((1L, "changed")))
  }

  test("cdcDelta emits upserts with NEW payloads and deletes with null payloads") {
    val got = Diff.cdcDelta(oldSnap, newSnap, Seq("k"))
      .orderBy("k").as[(Long, String, Option[String], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      (2L, "upsert", Some("B"), Some(20.0)),
      (3L, "upsert", Some("c"), Some(31.0)),
      (4L, "delete", None, None),
      (5L, "upsert", Some("e"), Some(50.0))))
  }

  test("cdcApply round-trip: base + delta reproduces the new snapshot exactly") {
    val delta = Diff.cdcDelta(oldSnap, newSnap, Seq("k"))
    val applied = Diff.cdcApply(oldSnap, delta, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    val want = newSnap.as[(Long, String, Double)].collect().toSet
    assert(applied === want)
    // empty delta: apply is the identity
    val idApplied = Diff.cdcApply(oldSnap,
      Diff.cdcDelta(oldSnap, oldSnap, Seq("k")), Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(idApplied === oldSnap.as[(Long, String, Double)].collect().toSet)
  }

  test("snapshotDiffKeys refuses NULL keys; reserved column names refuse at plan time") {
    val bad = Seq((Option.empty[Long], "x")).toDF("k", "s")
    val e = intercept[Exception] {
      Diff.snapshotDiffKeys(bad, Seq((1L, "a")).toDF("k", "s"),
        Seq("k")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("NULL key"),
      s"got: ${e.getMessage}")
    val clash = Seq((1L, "a")).toDF("k", "change")
    val e2 = intercept[IllegalArgumentException] {
      Diff.snapshotDiff(clash, clash, Seq("k"))
    }
    assert(e2.getMessage.contains("collide"), e2.getMessage)
  }

  test("missing compared columns refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      Diff.snapshotDiff(oldSnap.drop("v"), newSnap, Seq("k"))
    }
    assert(e.getMessage.contains("absent"), e.getMessage)
  }
}

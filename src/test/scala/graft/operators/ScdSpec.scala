package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def history(rows: Seq[(Long, java.sql.Date, Long, Option[String])]) =
    Scd.scd2FromChangeLog(
      rows.toDF("k", "ts", "seq", "status"),
      keyCols = Seq("k"), tsCol = "ts", seqCol = "seq", attrCols = Seq("status"))

  test("consecutive identical states collapse into one version interval") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 1L, Some("new")),
      (1L, d("2024-01-05"), 2L, Some("new")),   // unchanged — same version
      (1L, d("2024-02-01"), 3L, Some("active")),
      (1L, d("2024-03-01"), 4L, Some("new"))    // back to "new" — NEW version
    )).orderBy("valid_from")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, Some("new"), d("2024-01-01"), Some(d("2024-02-01")), false),
      (1L, Some("active"), d("2024-02-01"), Some(d("2024-03-01")), false),
      (1L, Some("new"), d("2024-03-01"), None, true)))
  }

  test("NULL attribute values are real states and NULL→NULL is unchanged") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 1L, None),
      (1L, d("2024-01-02"), 2L, None),          // null → null: no new version
      (1L, d("2024-01-03"), 3L, Some("set"))
    )).orderBy("valid_from")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, None, d("2024-01-01"), Some(d("2024-01-03")), false),
      (1L, Some("set"), d("2024-01-03"), None, true)))
  }

  test("same-timestamp changes order by the tiebreak column") {
    val out = history(Seq(
      (1L, d("2024-01-01"), 2L, Some("b")),     // seq 2: later
      (1L, d("2024-01-01"), 1L, Some("a"))      // seq 1: first version
    )).orderBy("valid_from", "status")
      .as[(Long, Option[String], java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, Some("a"), d("2024-01-01"), Some(d("2024-01-01")), false),
      (1L, Some("b"), d("2024-01-01"), None, true)))
  }

  test("intervals chain per key: each valid_to equals the next valid_from, one current row") {
    val changes = (1 to 50).map { i =>
      (i % 5).toLong // 5 keys
    }.zipWithIndex.map { case (k, i) =>
      (k, d(f"2024-01-${i % 28 + 1}%02d"), i.toLong, Some(s"s${i % 3}"))
    }
    val h = history(changes)
    val perKey = h.groupBy("k")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_versions"))
      .as[(Long, Long, Long)].collect()
    assert(perKey.forall(_._2 == 1), "exactly one current version per key")
    // every non-current valid_to must equal some valid_from of the same key
    val dangling = h.filter(!col("is_current")).as("a")
      .join(h.as("b"),
        col("a.k") === col("b.k") && col("a.valid_to") === col("b.valid_from"),
        "left_anti")
    assert(dangling.count() === 0)
  }

  test("plans a single exchange: both window passes share one shuffle") {
    val plan = history(Seq((1L, d("2024-01-01"), 1L, Some("x"))))
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  // ------------------------------------------------------- scd2ApplyCdc
  private val d1 = d("2024-01-01")
  private val d2 = d("2024-02-01")

  private def openHistory(snap: Seq[(Long, String)]) =
    snap.toDF("k", "status")
      .withColumn("valid_from", lit(d1))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  test("scd2ApplyCdc: change closes+opens, delete closes with NO current row, add opens") {
    val s1 = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    val s2 = Seq((1L, "a"), (2L, "B"), (4L, "d"))   // 2 changed, 3 deleted, 4 added
    val delta = Diff.cdcDelta(s1.toDF("k", "status"), s2.toDF("k", "status"), Seq("k"))
    val out = Scd.scd2ApplyCdc(openHistory(s1), delta,
      Seq("k"), Seq("status"), lit(d2))
      .orderBy("k", "valid_from")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date], Boolean)]
      .collect()
    assert(out === Array(
      (1L, "a", d1, None, true),          // untouched: open 2024-01 version rides through
      (2L, "b", d1, Some(d2), false),     // changed: old version closes at ts...
      (2L, "B", d2, None, true),          //          ...new payload opens current
      (3L, "c", d1, Some(d2), false),     // deleted: closes — and NO current row follows
      (4L, "d", d2, None, true)))         // added: opens current at ts
    // the delete capability: key 3 must have zero current rows
    assert(out.count(r => r._1 == 3L && r._5) === 0)
  }

  test("scd2ApplyCdc: agrees with scd2FromChangeLog on non-deleted keys") {
    val s1 = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    val s2 = Seq((1L, "a"), (2L, "B"), (4L, "d"))
    val applied = Scd.scd2ApplyCdc(openHistory(s1),
      Diff.cdcDelta(s1.toDF("k", "status"), s2.toDF("k", "status"), Seq("k")),
      Seq("k"), Seq("status"), lit(d2))
      .filter(col("k") =!= 3L)   // deletion is the capability the change log CANNOT see
    val log = (s1.map { case (k, v) => (k, d1, 1L, v) } ++
      s2.map { case (k, v) => (k, d2, 2L, v) }).toDF("k", "ts", "seq", "status")
    val replayed = Scd.scd2FromChangeLog(log, Seq("k"), "ts", "seq", Seq("status"))
      .filter(col("k") =!= 3L)
      .select(applied.columns.map(col).toIndexedSeq: _*)
    assert(applied.exceptAll(replayed).isEmpty && replayed.exceptAll(applied).isEmpty,
      s"apply-CDC diverges from change-log replay:\n" +
        s"applied=${applied.collect().mkString(";")}\nreplayed=${replayed.collect().mkString(";")}")
  }

  test("scd2ApplyCdc: empty delta returns the history unchanged") {
    val h = openHistory(Seq((1L, "a"), (2L, "b")))
    val empty = Seq.empty[(Long, String, String)].toDF("k", "op", "status")
    val out = Scd.scd2ApplyCdc(h, empty, Seq("k"), Seq("status"), lit(d2))
    assert(out.exceptAll(h).isEmpty && h.exceptAll(out).isEmpty)
  }
}

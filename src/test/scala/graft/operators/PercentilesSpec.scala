package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class PercentilesSpec extends SparkSpecBase {
  import spark.implicits._

  private def viaBuiltin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"),
        count(col("v")).as("n"))
      .as[(String, Double, Double, Long)].collect().toSet

  private def viaOperator(df: org.apache.spark.sql.DataFrame) =
    Percentiles.interpolated(df, Seq("g"), "v",
      Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(String, Double, Double, Long)].collect().toSet

  // The operator interpolates as lo + (hi-lo)*w — DuckDB quantile_cont's
  // exact op sequence, since the DuckDB oracle is the hash-equality gate.
  // Spark's builtin percentile computes lo*(1-w) + hi*w, which can differ
  // in the last ULP, so agreement with the builtin is asserted to 1e-9
  // relative rather than bit-exact.
  test("matches Spark's exact percentile on random grouped data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 3}", rnd.nextDouble() * 1000.0)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val got = viaOperator(df).map(r => r._1 -> r).toMap
    val expected = viaBuiltin(df).map(r => r._1 -> r).toMap
    assert(got.keySet === expected.keySet)
    for ((k, (_, p50, p90, n)) <- expected) {
      val (_, g50, g90, gn) = got(k)
      assert(gn === n)
      assert(math.abs(g50 - p50) <= 1e-9 * math.abs(p50), s"p50 for $k")
      assert(math.abs(g90 - p90) <= 1e-9 * math.abs(p90), s"p90 for $k")
    }
  }

  test("values (driver form) is bit-equal to interpolated for wide fraction lists") {
    val rnd = new scala.util.Random(31)
    val df = (1 to 4001).map(_ => rnd.nextDouble() * 1e6 - 5e5).toDF("v")
      .repartition(7)
    val fracs = (1 to 255).map(_ / 256.0)
    val viaValues = Percentiles.values(df, "v", fracs)
    val ps = fracs.zipWithIndex.map { case (p, i) => (s"q$i", p) }
    val row = Percentiles.interpolated(df, Nil, "v", ps).head()
    val viaDf = fracs.indices.map(row.getDouble)
    assert(viaValues.length === 255)
    // BIT equality — same op order, so no tolerance
    fracs.indices.foreach(i => assert(
      java.lang.Double.doubleToLongBits(viaValues(i)) ===
        java.lang.Double.doubleToLongBits(viaDf(i)), s"fraction index $i"))
    // endpoints + duplicates + tiny input
    val tiny = Seq(3.0, 1.0, 2.0, 2.0).toDF("v")
    assert(Percentiles.values(tiny, "v", Seq(0.0, 0.5, 1.0)) ===
      IndexedSeq(1.0, 2.0, 3.0))
    assert(Percentiles.values(Seq(42.0).toDF("v"), "v", Seq(0.0, 0.3, 1.0)) ===
      IndexedSeq(42.0, 42.0, 42.0))
  }

  test("handles single-value groups, duplicates, and p=0/1 endpoints") {
    val df = Seq(
      ("a", 5.0), // n=1
      ("b", 1.0), ("b", 1.0), ("b", 1.0), // all-duplicate group
      ("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0)
    ).toDF("g", "v")
    val out = Percentiles.interpolated(df, Seq("g"), "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .as[(String, Double, Double, Double, Long)].collect().toSet
    assert(out === Set(
      ("a", 5.0, 5.0, 5.0, 1L),
      ("b", 1.0, 1.0, 1.0, 3L),
      ("c", 1.0, 2.5, 4.0, 4L)))
  }

  test("ignores nulls and skips empty groups entirely") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)
    ).toDF("g", "v")
    val out = Percentiles.interpolated(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .as[(String, Double, Long)].collect().toSet
    // group b has only nulls -> no percentile row (same as the builtin
    // returning null; the operator's contract is rows for groups with data)
    assert(out === Set(("a", 2.0, 2L)))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Percentiles.interpolated(df, Seq("g"), "v", Seq("p50" -> 0.5)).count() === 0)
  }

  test("multi-column grouping keys") {
    val df = Seq(
      ("x", 1, 10.0), ("x", 1, 20.0), ("x", 2, 30.0), ("y", 1, 40.0)
    ).toDF("g1", "g2", "v")
    val out = Percentiles.interpolated(df, Seq("g1", "g2"), "v", Seq("p50" -> 0.5))
      .as[(String, Int, Double, Long)].collect().toSet
    assert(out === Set(
      ("x", 1, 15.0, 2L), ("x", 2, 30.0, 1L), ("y", 1, 40.0, 1L)))
  }

  // ---- interpolatedManyGroups: the hash-partitioned high-cardinality path

  test("manyGroups path is bit-equal to the range-sort path on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i => (s"g${i % 7}", rnd.nextDouble() * 1000.0))
    val df = rows.toDF("g", "v").repartition(8)
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val few = Percentiles.interpolated(df, Seq("g"), "v", ps)
      .as[(String, Double, Double, Double, Double, Long)].collect().toSet
    val many = Percentiles.interpolatedManyGroups(df, Seq("g"), "v", ps)
      .as[(String, Double, Double, Double, Double, Long)].collect().toSet
    // both interpolate as lo + (hi−lo)·w over the same bracketing rows,
    // so agreement is exact, not approximate
    assert(many === few)
  }

  test("manyGroups handles 2×10⁴ groups, matching a naive per-group oracle") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 20000).flatMap { gid =>
      (0 until 1 + rnd.nextInt(12)).map(_ => (gid, rnd.nextDouble() * 100.0))
    }
    val df = rows.toDF("g", "v").repartition(32)
    val got = Percentiles.interpolatedManyGroups(df, Seq("g"), "v",
      Seq("p50" -> 0.5, "p90" -> 0.9))
      .as[(Int, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    def naive(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val h = (s.size - 1) * p
      val lo = s(math.floor(h).toInt)
      val hi = s(math.min(math.ceil(h).toInt, s.size - 1))
      lo + (hi - lo) * (h - math.floor(h))
    }
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> (naive(vs.map(_._2), 0.5), naive(vs.map(_._2), 0.9), vs.size.toLong)
    }
    assert(got.size === expected.size)
    for ((g, (e50, e90, en)) <- expected) {
      val (_, g50, g90, gn) = got(g)
      assert(gn === en, s"n for $g")
      assert(g50 === e50, s"p50 for $g")
      assert(g90 === e90, s"p90 for $g")
    }
  }

  test("manyGroups edge cases: single-value, duplicates, endpoints, nulls") {
    val df = Seq(
      ("a", Some(5.0)),
      ("b", Some(1.0)), ("b", Some(1.0)), ("b", Some(1.0)),
      ("c", Some(1.0)), ("c", Some(2.0)), ("c", Some(3.0)), ("c", Some(4.0)),
      ("d", None)
    ).toDF("g", "v")
    val out = Percentiles.interpolatedManyGroups(df, Seq("g"), "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .as[(String, Double, Double, Double, Long)].collect().toSet
    assert(out === Set(
      ("a", 5.0, 5.0, 5.0, 1L),
      ("b", 1.0, 1.0, 1.0, 3L),
      ("c", 1.0, 2.5, 4.0, 4L)))
  }

  // The two paths plan differently: interpolated round-trips through an
  // RDD (ExistingRDD scan), manyGroups is pure Catalyst with a Window.
  private def usesWindow(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Window")

  test("auto dispatches on group cardinality and both routes stay bit-equal") {
    val rnd = new scala.util.Random(11)
    val few = (1 to 2000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100)).toDF("g", "v")
    val many = (1 to 5000).map(i => (s"g${i % 2000}", rnd.nextDouble() * 100)).toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)

    val fewAuto = Percentiles.auto(few, Seq("g"), "v", ps, manyGroupsThreshold = 100)
    assert(!usesWindow(fewAuto), "3 groups must route to the range-sort path")
    assert(fewAuto.collect().toSet ===
      Percentiles.interpolated(few, Seq("g"), "v", ps).collect().toSet)

    val manyAuto = Percentiles.auto(many, Seq("g"), "v", ps, manyGroupsThreshold = 100)
    assert(usesWindow(manyAuto), "2000 groups must route to the window path")
    assert(manyAuto.collect().toSet ===
      Percentiles.interpolatedManyGroups(many, Seq("g"), "v", ps).collect().toSet)

    // a hint overrides the probe entirely
    val hinted = Percentiles.auto(few, Seq("g"), "v", ps,
      groupCountHint = Some(1000000), manyGroupsThreshold = 100)
    assert(usesWindow(hinted))
  }

  test("manyGroups guard fails loud on a group above maxGroupRows") {
    val df = (1 to 100).map(i => (s"g${i % 10}", i.toDouble)).toDF("g", "v")
    // 10 rows per group; a 5-row cap must raise, and the message must
    // point at the right fix
    val ex = intercept[Exception] {
      Percentiles.interpolatedManyGroups(df, Seq("g"), "v",
        Seq("p50" -> 0.5), maxGroupRows = 5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxGroupRows")), ex.toString)
    // under the cap: normal results
    val ok = Percentiles.interpolatedManyGroups(df, Seq("g"), "v",
      Seq("p50" -> 0.5), maxGroupRows = 10)
    assert(ok.count() === 10L)
  }
}

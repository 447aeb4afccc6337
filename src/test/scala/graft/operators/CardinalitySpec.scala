package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CardinalitySpec extends SparkSpecBase {
  import spark.implicits._

  test("under k distinct values the sketch IS the distinct set and the estimate is exact") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 9L))
      .toDF("g", "v")
    val out = Cardinality.distinctWithEstimates(df, col("g"), col("v"), k = 32)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out === Array(("a", 3L, 3.0), ("b", 1L, 1.0)))
  }

  test("estimate lands within the 3-sigma KMV band on a large group") {
    val k = 64
    val n = 20000L
    val df = spark.range(n).select(lit("g").as("g"), col("id").as("v"))
    val Array((_, exact, est)) =
      Cardinality.distinctWithEstimates(df, col("g"), col("v"), k)
        .as[(String, Long, Double)].collect()
    assert(exact === n)
    // KMV relative sd ~ 1/sqrt(k-2); 3 sigma at k=64 is ~38%
    val rel = math.abs(est / n - 1.0)
    assert(rel < 0.38, f"KMV estimate $est vs $n (rel err $rel%.3f)")
  }

  test("sketch merge is associative: union of shards equals whole-corpus sketch") {
    val k = 16
    val whole = spark.range(0, 5000).select(lit("g").as("g"), col("id").as("v"))
    val sAll = Cardinality.kmvSketch(whole, col("g"), col("v"), k)
      .as[(String, Seq[Long])].head()._2
    // shard by parity, sketch each, merge = dedup-concat + re-take k
    val sketches = Seq(0, 1).map { p =>
      Cardinality.kmvSketch(whole.filter(col("v") % 2 === p),
        col("g"), col("v"), k).as[(String, Seq[Long])].head()._2
    }
    val merged = sketches.flatten.distinct.sorted.take(k)
    assert(merged === sAll.toList, "merged shard sketches diverge from whole-corpus sketch")
  }

  test("sketch algebra: under-k sketches give EXACT jaccard and intersection") {
    val k = 64
    // A = {0..49}, B = {30..79}: |A∩B| = 20, |A∪B| = 80 — over k? no: 80 > 64.
    // use smaller: A = {0..19}, B = {10..29}: inter 10, union 30 < 64 → exact
    val df = spark.range(0, 20).select(lit("A").as("g"), col("id").as("v"))
      .union(spark.range(10, 30).select(lit("B").as("g"), col("id").as("v")))
    val sk = Cardinality.kmvSketch(df, col("g"), col("v"), k)
    val row = sk.groupBy().pivot("group").agg(first("sketch"))
      .select(
        Cardinality.kmvJaccard(col("A"), col("B"), k).as("j"),
        Cardinality.kmvIntersection(col("A"), col("B"), k).as("i"))
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - 10.0 / 30.0) < 1e-12, s"jaccard ${row._1}")
    assert(math.abs(row._2 - 10.0) < 1e-9, s"intersection ${row._2}")
  }

  test("sketch algebra: estimates land near truth on large overlapping sets") {
    val k = 256
    // A = {0..9999}, B = {5000..14999}: jaccard = 5000/15000 = 1/3
    val df = spark.range(0, 10000).select(lit("A").as("g"), col("id").as("v"))
      .union(spark.range(5000, 15000).select(lit("B").as("g"), col("id").as("v")))
    val sk = Cardinality.kmvSketch(df, col("g"), col("v"), k)
    val (j, i) = sk.groupBy().pivot("group").agg(first("sketch"))
      .select(
        Cardinality.kmvJaccard(col("A"), col("B"), k).as("j"),
        Cardinality.kmvIntersection(col("A"), col("B"), k).as("i"))
      .as[(Double, Double)].head()
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard est $j vs 0.333")
    assert(math.abs(i / 5000.0 - 1.0) < 0.35, s"intersection est $i vs 5000")
  }

  test("duplicates never occupy sketch slots") {
    val df = spark.range(0, 1000)
      .select(lit("g").as("g"), (col("id") % 5).as("v")) // 5 distinct, massively repeated
    val s = Cardinality.kmvSketch(df, col("g"), col("v"), k = 8)
      .as[(String, Seq[Long])].head()._2
    assert(s.size === 5)
    assert(s.distinct.size === 5)
    assert(s === s.sorted)
  }
}

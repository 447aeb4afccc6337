package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated percentiles (SQL `quantile_cont` / Spark
  * `percentile` semantics: rank h = (n−1)·p over the ascending
  * non-null values, linear interpolation between the two bracketing
  * values) — computed with a distributed sort instead of an
  * aggregation buffer.
  *
  * Why not `percentile()`: Spark's exact percentile is a
  * TypedImperativeAggregate whose buffer is a value→count map of the
  * ENTIRE group. Every partial buffer is serialized, shuffled to one
  * reducer per group, merged, then sorted — for few large groups
  * that is a single-threaded O(group) merge+sort per group and an
  * O(group)-memory buffer: the 3-reducer bottleneck at 100 TB, and
  * already the slowest aggregate in the sf0.1 bench.
  *
  * Shape here instead:
  *   1. range-partition by (group, value) + sort within partitions —
  *      a distributed sort, every partition bounded by
  *      `spark.sql.files/shuffle` sizing, no per-group memory;
  *   2. one tiny pass collects per-(partition, group) row counts to
  *      the driver — O(partitions × groups), the only driver-side
  *      data — giving each partition its global rank offset and each
  *      group its total n;
  *   3. a second pass over the SAME materialized partitions emits
  *      only the bracketing rows each percentile needs (≤ 2 rows per
  *      percentile per group), which a final tiny aggregation
  *      interpolates.
  *
  * The sorted intermediate is localCheckpoint-ed so both passes see
  * identical partitioning (range-partitioner sampling is not
  * otherwise stable across executions); a cluster deployment at
  * extreme scale would persist(DISK_ONLY) instead — same plan.
  *
  * Intended for FEW groups × MANY rows (the reference's analyst
  * shape). For many-group percentiles use a window/row_number form:
  * there the per-group sort parallelizes across groups naturally.
  *
  * @param ps (outputColumn, fraction) pairs, fractions in [0,1]
  * @return one row per group: groupCols ++ ps columns (double) ++
  *         n (bigint, count of non-null values)
  */
object Percentiles {

  /** Ungrouped exact quantile VALUES straight to the driver — the
    * boundary-computation form (equal-depth z-order, histogram edges):
    * identical semantics and IEEE arithmetic to [[interpolated]] with
    * no group columns (rank h = (n−1)·p, bracketing rows combined as
    * lo + (hi−lo)·w), but the result is a Scala IndexedSeq instead of
    * a one-row DataFrame. Exists because the DataFrame form pivots
    * its output through 3·|ps| aggregate expressions — at 255
    * quantiles that is a ~765-column aggregate whose codegen
    * compilation alone costs seconds (measured: 5.2 s vs 1.4 s for
    * the same data at ps=3); here the ≤ 2·|ps| bracketing rows are
    * collected (bounded driver data) and combined in plain Scala.
    * Same two passes over the same checkpointed sort. */
  def values(df: DataFrame, valueCol: String,
             fracs: Seq[Double]): IndexedSeq[Double] = {
    require(fracs.nonEmpty && fracs.forall(p => p >= 0.0 && p <= 1.0),
      "percentile fractions must lie in [0,1]")
    val sorted = df
      .select(col(valueCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
      .repartitionByRange(col("_v"))
      .sortWithinPartitions("_v")
      .localCheckpoint(true)
    val counts = BoundedRead.boundedDriverRead(
      sorted.withColumn("_pid", spark_partition_id()).groupBy("_pid").count(),
      maxRows = sorted.rdd.getNumPartitions max 1,
      what = "Percentiles.values partition counts",
      boundWhy = "one row per partition of the checkpointed sort")
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    require(n > 0, s"no non-null rows in $valueCol")
    // rank offset of each partition = prefix sum of earlier partitions
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    // needed 1-based global ranks: ⌊h⌋+1 (lo) and +2 when w > 0 (hi)
    val needed: Set[Long] = fracs.flatMap { p =>
      val h = (n - 1) * p
      val lo = math.floor(h).toLong + 1
      if (h - math.floor(h) > 0.0) Seq(lo, lo + 1) else Seq(lo)
    }.toSet
    val bNeeded = df.sparkSession.sparkContext.broadcast(needed)
    val bOffsets = df.sparkSession.sparkContext.broadcast(offsets)
    val picked: Map[Long, Double] = sorted.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val want = bNeeded.value
        var rank = bOffsets.value.getOrElse(pid, 0L)
        rows.flatMap { row =>
          rank += 1
          if (want(rank)) Some(rank -> row.getDouble(0)) else None
        }
      }
      .collect().toMap
    fracs.map { p =>
      val h = (n - 1) * p
      val w = h - math.floor(h)
      val lo = picked(math.floor(h).toLong + 1)
      // same op order as interpolated/quantile_cont: lo + (hi − lo)·w
      if (w > 0.0) lo + (picked(math.floor(h).toLong + 2) - lo) * w else lo
    }.toIndexedSeq
  }

  def interpolated(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "percentile fractions must lie in [0,1]")
    // group keys are used as Scala map keys (offset/target lookups) and
    // for run detection in the partition scan; binary/array/struct
    // values compare by reference there, which would silently resolve
    // every offset to 0 — reject them up front
    groupCols.foreach { c =>
      val bad = df.schema(c).dataType match {
        case _: BinaryType | _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      }
      require(!bad,
        s"group column $c has type ${df.schema(c).dataType.simpleString}, " +
          "which compares by reference on the JVM; percentile grouping " +
          "requires value-comparable atomic keys")
    }
    val spark = df.sparkSession
    val g = groupCols.size

    val sorted = df
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .repartitionByRange(groupCols.map(col) :+ col("_v"): _*)
      .sortWithinPartitions(groupCols.map(col) :+ col("_v"): _*)
      .localCheckpoint(true)

    // pass 1: per-(partition, group) counts → rank offsets + group totals.
    // spark_partition_id is nondeterministic so it can't sit in the
    // groupBy clause directly; projecting it first is equivalent (it is
    // evaluated on the checkpointed partitions, before the agg shuffle)
    val counts = BoundedRead.boundedDriverRead(
      sorted.withColumn("_pid", spark_partition_id())
        .groupBy(("_pid" +: groupCols).map(col): _*)
        .count(),
      maxRows = 1 << 20,
      what = "Percentiles.interpolated per-(partition, group) counts",
      boundWhy = "partitions x groups; this operator's contract is " +
        "report-scale group counts (use manyGroups for corpus-scale keys)")
      .map(r => (r.getInt(0), r.toSeq.slice(1, 1 + g), r.getLong(1 + g)))
      .sortBy(_._1)
    val totals: Map[Seq[Any], Long] =
      counts.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val offsets: Map[(Int, Seq[Any]), Long] = {
      val running = collection.mutable.Map.empty[Seq[Any], Long].withDefaultValue(0L)
      counts.map { case (pid, key, n) =>
        val off = running(key); running(key) = off + n; (pid, key) -> off
      }.toMap
    }
    // target ranks (1-based): h = (n−1)p ⇒ bracketing rows
    // value[⌊h⌋+1] (role "lo") and value[⌊h⌋+2] (role "hi"), combined
    // at the end as lo + (hi−lo)·w — the exact op sequence Spark's
    // percentile and DuckDB's quantile_cont use, so results are
    // bit-identical to theirs (a lo·(1−w)+hi·w weighted sum can differ
    // in the last ULP)
    val targets: Map[Seq[Any], Map[Long, Seq[(String, String, Double)]]] =
      totals.map { case (key, n) =>
        val m = collection.mutable.Map.empty[Long, List[(String, String, Double)]]
          .withDefaultValue(Nil)
        ps.foreach { case (name, p) =>
          val h = (n - 1) * p
          val lo = math.floor(h).toLong + 1
          val w = h - math.floor(h)
          m(lo) = (name, "lo", w) :: m(lo)
          if (w > 0.0) m(lo + 1) = (name, "hi", w) :: m(lo + 1)
        }
        key -> m.toMap.map { case (k, v) => k -> (v: Seq[(String, String, Double)]) }
      }

    // pass 2: emit only the bracketing rows, with their weights applied
    val bTargets = spark.sparkContext.broadcast(targets)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val contribRows = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val offs = bOffsets.value
      val tgts = bTargets.value
      var curKey: Seq[Any] = null
      var rank = 0L
      var curTargets: Map[Long, Seq[(String, String, Double)]] = Map.empty
      rows.flatMap { row =>
        val key = row.toSeq.take(g)
        if (key != curKey) {
          curKey = key
          rank = offs.getOrElse((pid, key), 0L)
          curTargets = tgts.getOrElse(key, Map.empty)
        }
        rank += 1
        curTargets.getOrElse(rank, Nil).map { case (name, role, w) =>
          Row.fromSeq(key ++ Seq(name, role, row.getDouble(g), w))
        }
      }
    }
    val groupFields = groupCols.map(c => df.schema(c))
    val contribSchema = StructType(groupFields ++
      Seq(StructField("_p", StringType), StructField("_role", StringType),
        StructField("_bv", DoubleType), StructField("_w", DoubleType)))
    val contribs = spark.createDataFrame(contribRows, contribSchema)

    val totalRows = totals.toSeq.map { case (key, n) => Row.fromSeq(key :+ n) }
    val totalsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(totalRows, 1),
      StructType(groupFields :+ StructField("n", LongType, nullable = false)))

    // per percentile: pick the lo/hi bracketing values + weight out of
    // the (≤ 2·|ps|-row-per-group) contributions, then combine as
    // lo + (hi−lo)·w; a missing hi row (w == 0, exact rank hit) falls
    // back to lo, making the result exactly value[⌊h⌋+1]
    def pick(name: String, role: String) =
      first(when(col("_p") === name && col("_role") === role, col("_bv")),
        ignoreNulls = true)
    val aggCols = ps.flatMap { case (name, _) => Seq(
      pick(name, "lo").as(s"_lo_$name"),
      pick(name, "hi").as(s"_hi_$name"),
      first(when(col("_p") === name, col("_w")), ignoreNulls = true)
        .as(s"_w_$name"))
    }
    val finalCols = groupCols.map(col) ++ ps.map { case (name, _) =>
      (col(s"_lo_$name") +
        (coalesce(col(s"_hi_$name"), col(s"_lo_$name")) - col(s"_lo_$name")) *
          col(s"_w_$name")).as(name)
    }
    contribs
      .groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(finalCols: _*)
      .join(broadcast(totalsDf), groupCols, "right")
  }

  /** The MANY-groups counterpart of [[interpolated]]: same semantics
    * (SQL `quantile_cont` rank h = (n−1)·p, bracketing rows combined
    * as lo + (hi−lo)·w — bit-identical to Spark's `percentile` and
    * DuckDB), same output schema (groupCols ++ ps ++ n), different
    * physical shape.
    *
    * Where [[interpolated]] range-sorts the whole table and collects
    * O(partitions × groups) boundary counts to the driver — ideal for
    * FEW groups × MANY rows, untenable when groups number 10⁵+ —
    * this variant hash-partitions by group and ranks each group with
    * a window: `row_number()` + partition `count()` over the SAME
    * single exchange, a rank filter that keeps only the ≤ 2·|ps|
    * bracketing rows per group, and a final aggregate that Catalyst
    * places on the existing partitioning (no second shuffle). Nothing
    * touches the driver; per-group sort parallelizes across groups.
    *
    * The trade: per-partition memory is the sum of its groups' rows
    * during the window sort (spillable), and a single giant group
    * lands on one task — the exact shape [[interpolated]] exists for.
    * Pick by cardinality: few groups → interpolated, many → this.
    */
  /** Single entry point that PICKS the physical path from group
    * cardinality, closing the wrong-regime footgun: a caller who
    * guesses wrong otherwise gets either a driver-side
    * O(partitions × groups) collect ([[interpolated]] under millions
    * of groups) or a one-task giant group ([[interpolatedManyGroups]]
    * under 3 groups). The probe is one HLL aggregate over the group
    * key — a scan, not a shuffle of the data; at warehouse scale pass
    * `groupCountHint` from table statistics and skip even that.
    *
    * `maxGroupRows` is forwarded to the many-groups path as its loud
    * guard (see there); 0 disables.
    */
  def auto(df: DataFrame, groupCols: Seq[String], valueCol: String,
           ps: Seq[(String, Double)],
           groupCountHint: Option[Long] = None,
           manyGroupsThreshold: Long = 1024,
           maxGroupRows: Long = 200L * 1000 * 1000): DataFrame = {
    // ungrouped = the one-group few-group shape by definition
    if (groupCols.isEmpty) return interpolated(df, groupCols, valueCol, ps)
    val nGroups = groupCountHint.getOrElse {
      df.agg(approx_count_distinct(struct(groupCols.map(col): _*)).as("c"))
        .head().getLong(0)
    }
    if (nGroups > manyGroupsThreshold)
      interpolatedManyGroups(df, groupCols, valueCol, ps, maxGroupRows)
    else
      interpolated(df, groupCols, valueCol, ps)
  }

  /** @param maxGroupRows loud-failure guard: if any group's non-null
    *        row count exceeds this, the query FAILS (raise_error) —
    *        a group that large belongs on the [[interpolated]] range-
    *        sort path, and a silent one-task sort at 100 TB is a
    *        worse outcome than a diagnostic. 0 disables the check. */
  def interpolatedManyGroups(df: DataFrame, groupCols: Seq[String], valueCol: String,
                             ps: Seq[(String, Double)],
                             maxGroupRows: Long = 0L): DataFrame = {
    require(groupCols.nonEmpty, "interpolatedManyGroups requires group columns " +
      "(for the ungrouped case use interpolated — one group is the few-group shape)")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "percentile fractions must lie in [0,1]")
    val gCols = groupCols.map(col)
    val ranked = df
      .select(gCols :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(gCols: _*).orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(gCols: _*)))
    // h = (n−1)·p in double, identical op order to interpolated's
    // driver-side `(n - 1) * p`, so both paths interpolate bit-equally
    def h(n: Column, p: Double): Column = (n - 1).cast("double") * lit(p)
    def loRank(n: Column, p: Double): Column = floor(h(n, p)) + 1
    // ties in _v make row_number nondeterministic BETWEEN equal values,
    // but any rank in a tie run carries the same _v — bracketing values
    // are well-defined regardless of which duplicate gets which rank
    val keep = ps.map { case (_, p) =>
      col("_rn") === loRank(col("_n"), p) ||
        col("_rn") === loRank(col("_n"), p) + 1
    }.reduce(_ || _)
    val aggCols = ps.flatMap { case (name, p) => Seq(
      max(when(col("_rn") === loRank(col("_n"), p), col("_v"))).as(s"_lo_$name"),
      max(when(col("_rn") === loRank(col("_n"), p) + 1, col("_v"))).as(s"_hi_$name"))
    } :+ max(col("_n")).as("n")
    val finalCols = gCols ++ ps.map { case (name, p) =>
      val w = h(col("n"), p) - floor(h(col("n"), p)).cast("double")
      (col(s"_lo_$name") +
        (coalesce(col(s"_hi_$name"), col(s"_lo_$name")) - col(s"_lo_$name")) * w)
        .as(name)
    } :+ col("n")
    val agged = ranked.filter(keep)
      .groupBy(gCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val guarded =
      if (maxGroupRows <= 0L) agged
      else agged.filter(
        when(col("n") > maxGroupRows,
          raise_error(concat(
            lit(s"percentile group exceeds maxGroupRows=$maxGroupRows (n="),
            col("n").cast("string"),
            lit(s"); route groups this large through Percentiles.interpolated"))).cast("boolean"))
          .otherwise(lit(true)))
    guarded.select(finalCols: _*)
  }
}

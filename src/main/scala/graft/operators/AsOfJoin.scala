package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the single
  * most recent right row with the same key whose time is ≤ (or <) the
  * left row's time.
  *
  * Implementation is the sort-based union trick, not a join:
  * tag both sides, union them, and run `last(right_value) IGNORE
  * NULLS` over a window partitioned by key and ordered by (time,
  * side). Cost = ONE hash-partition shuffle + per-partition sort over
  * |L|+|R| rows — no row multiplication ever happens, unlike the
  * naive non-equi join (which Spark would plan as a nested loop and
  * whose intermediate is |L|×|R| per key before the "latest" filter).
  * This is the canonical scalable as-of shape; at 1000 executors it
  * behaves exactly like any other keyed window.
  *
  * Strictness: `strict = false` (default) matches right rows with
  * time ≤ left time; `strict = true` matches only time < left time —
  * ordering right rows before left rows at equal timestamps or not.
  *
  * Determinism note: if the RIGHT side has several rows with the same
  * (key, time), which of them wins is unspecified (same as SQL ASOF
  * implementations). Dedupe the right side on (key, time) first when
  * that matters.
  */
object AsOfJoin {

  private val SIDE = "_asof_side"

  /** @param left       probe side; all its columns pass through
    * @param right      reference side
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to carry (renamed as given)
    * @return left rows + payload columns (null when no prior right row)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Map[String, String],
           strict: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val t = "_asof_t"
    val leftCols = left.columns.toSeq
    val payloadSeq = payload.toSeq // (right source col, output name)

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(SIDE, lit(1))
      .select((keyCols.map(col) :+ col(t) :+ col(SIDE)) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payloadSeq.map { case (src, dst) =>
          lit(null).cast(right.schema(src).dataType).as(dst)
        }: _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(SIDE, lit(0))
      .select((keyCols.map(col) :+ col(t) :+ col(SIDE)) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadSeq.map { case (src, dst) => col(src).as(dst) }: _*)

    // at equal time: side 0 (right) sorts first unless strict — so a
    // left row at time T sees a right row at exactly T iff !strict
    val sideOrder = if (strict) col(SIDE).desc else col(SIDE).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t).asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payload.values.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(SIDE) === 1).drop(SIDE, t)
  }
}

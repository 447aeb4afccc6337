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
  *
  * Row atomicity: all payload columns are carried in ONE struct filled
  * by a single `last(_, ignoreNulls) `— the match is the whole most
  * recent right row, exactly as ASOF JOIN semantics demand. Filling
  * each payload column independently would (a) skip a genuinely NULL
  * value in the matched row in favor of an older row's value and
  * (b) let different payload columns come from DIFFERENT right rows.
  * The struct is non-null for every right row (even one whose payload
  * values are all null), so genuine nulls survive the fill.
  */
object AsOfJoin {

  private val SIDE = "_asof_side"
  private val PAY = "_asof_payload"

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
    val payType = org.apache.spark.sql.types.StructType(
      payloadSeq.map { case (src, dst) =>
        org.apache.spark.sql.types.StructField(dst, right.schema(src).dataType)
      })

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(SIDE, lit(1))
      .select((keyCols.map(col) :+ col(t) :+ col(SIDE)) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(payType).as(PAY): _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(SIDE, lit(0))
      .select((keyCols.map(col) :+ col(t) :+ col(SIDE)) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadSeq.map { case (src, dst) => col(src).as(dst) }: _*).as(PAY): _*)

    // at equal time: side 0 (right) sorts first unless strict — so a
    // left row at time T sees a right row at exactly T iff !strict
    val sideOrder = if (strict) col(SIDE).desc else col(SIDE).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t).asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE last() over the whole payload struct: the matched right row
    // is attached atomically (see scaladoc on row atomicity)
    l.unionByName(r)
      .withColumn(PAY, last(col(PAY), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)
      .select((keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payloadSeq.map { case (_, dst) => col(s"$PAY.$dst").as(dst) }): _*)
  }
}

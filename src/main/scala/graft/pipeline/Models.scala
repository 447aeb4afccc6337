package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.IntervalExpand

/** The reference's model layer re-expressed as DataFrame functions:
  * staging → curated → marts (reference: dbt/stripe/models/...;
  * layer description README.md:20-26).
  *
  * Every model is `(inputs...) => DataFrame` — the dbt `ref()` DAG
  * (stripe_update_dag.py:22-42) becomes plain function composition in
  * `Pipeline`. `CURRENT_DATE()`/`CURRENT_TIMESTAMP()` in the
  * reference are replaced by an injected `asOf` clock so runs are
  * deterministic and testable (SURVEY §7.4 risk 2).
  */
object Models {

  // ------------------------------------------------------------ staging
  /** `SELECT s.*, DATE(TIMESTAMP_SECONDS(created))` — the star-plus
    * staging projection shared by all three sources (reference:
    * stg_invoices.sql:9-14, stg_subscriptions.sql:9-14,
    * stg_subscription_updates.sql:9-14). */
  def staged(raw: DataFrame): DataFrame =
    raw.withColumn("created_at_date",
      to_date(timestamp_seconds(col("created").cast("long"))))

  // ------------------------------------------------------------ dims
  /** Static FX matrix (reference: exchange_rates.sql:11-36 — 9
    * literal rows; rate_date := injected asOf instead of
    * CURRENT_DATE). */
  def exchangeRates(spark: SparkSession, asOf: LocalDate): DataFrame = {
    import spark.implicits._
    Seq(
      ("USD", "USD", 1.0), ("GBP", "USD", 1.27), ("EUR", "USD", 1.08),
      ("USD", "GBP", 0.79), ("EUR", "GBP", 0.85), ("GBP", "EUR", 1.17),
      ("USD", "EUR", 0.93), ("EUR", "EUR", 1.0), ("GBP", "GBP", 1.0))
      .toDF("from_currency", "to_currency", "exchange_rate")
      .withColumn("rate_date", lit(java.sql.Date.valueOf(asOf)))
  }

  /** Calendar spine 2020-01-01 → asOf with the reference's derived
    * columns — including its two deliberate quirks (reference:
    * calendar.sql:5-20):
    *  - `day_of_year` actually holds day-of-MONTH (calendar.sql:9
    *    labels EXTRACT(DAY ...) as day_of_year — replicated for
    *    output parity, SURVEY §2.9 ⚠);
    *  - `is_leap_year` counts spine days per year, so a partial final
    *    year reads as "leap" (calendar.sql:17 ⚠ — replicated).
    * `week_of_year` uses ISO weeks; `week_sunday_start` is BigQuery's
    * `EXTRACT(WEEK ...)` (calendar.sql:7): weeks begin on Sunday and
    * days before the year's first Sunday are week 0 — computed as the
    * count of Sundays elapsed, floor((doy + (dow(jan1)+5) mod 7) / 7),
    * pure date arithmetic so it stays inside codegen. Both conventions
    * ship (SURVEY §2.9). */
  def calendar(spark: SparkSession, asOf: LocalDate,
               spineStart: LocalDate = LocalDate.of(2020, 1, 1)): DataFrame = {
    val spine = spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(spineStart)),
        lit(java.sql.Date.valueOf(asOf)))).as("date_day"))
    val wMonth = Window.partitionBy(year(col("date_day")), month(col("date_day")))
    val wYear = Window.partitionBy(year(col("date_day")))
    val sundayWeek = floor(
      (dayofyear(col("date_day")) +
        pmod(dayofweek(trunc(col("date_day"), "year")) + 5, lit(7))) / 7)
      .cast("int")
    spine.select(
      col("date_day"),
      year(col("date_day")).as("year"),
      weekofyear(col("date_day")).as("week_of_year"),
      sundayWeek.as("week_sunday_start"),
      month(col("date_day")).as("month_of_year"),
      dayofmonth(col("date_day")).as("day_of_year"), // quirk: actually day-of-month
      quarter(col("date_day")).cast("string").as("quarter_of_year"),
      date_format(col("date_day"), "MMMM").as("month_name"),
      (weekday(col("date_day")) + 1).as("iso_day_of_week"),
      date_format(col("date_day"), "EEEE").as("day_name"),
      (!date_format(col("date_day"), "EEEE").isin("Saturday", "Sunday")).as("is_weekday"),
      count(lit(1)).over(wMonth).as("days_in_month"),
      (count(lit(1)).over(wYear) =!= 365).as("is_leap_year"))
  }

  // ------------------------------------------------------------ curated
  /** Curated invoices: 20-column typed rename with cents→units /100
    * on the six amount columns (reference: invoices.sql:16-53, cents
    * at :28-33). */
  def invoices(stgInvoices: DataFrame, loadedAt: Column): DataFrame =
    stgInvoices.select(
      col("id").as("invoice_id"),
      col("customer").as("customer_id"),
      col("subscription").as("subscription_id"),
      col("status"),
      col("currency"),
      timestamp_seconds(col("created").cast("long")).as("created_at"),
      col("created_at_date"),
      (col("amount_due").cast("double") / 100).as("amount_due"),
      (col("amount_paid").cast("double") / 100).as("amount_paid"),
      (col("amount_remaining").cast("double") / 100).as("amount_remaining"),
      (col("subtotal").cast("double") / 100).as("subtotal"),
      (col("total").cast("double") / 100).as("total"),
      (col("tax").cast("double") / 100).as("tax"),
      col("collection_method"),
      timestamp_seconds(col("period_start").cast("long")).as("period_start_at"),
      to_date(timestamp_seconds(col("period_start").cast("long"))).as("period_start_date"),
      timestamp_seconds(col("period_end").cast("long")).as("period_end_at"),
      to_date(timestamp_seconds(col("period_end").cast("long"))).as("period_end_date"),
      to_json(col("metadata")).as("metadata"),
      loadedAt.as("_loaded_at"))

  /** Curated invoice line items: lateral flatten of `lines.data` plus
    * tax aggregation and the period-end fallback (reference:
    * invoice_line_items.sql:16-118).
    *
    * Semantics carried over:
    *  - `explode` (not explode_outer): invoices with empty/null line
    *    arrays drop, matching UNNEST (invoice_line_items.sql:30-31)
    *  - defense-in-depth `status = 'paid'` filter (:32)
    *  - subscription fallback COALESCE(line.subscription,
    *    invoice.subscription) (:40)
    *  - tax_amount = COALESCE(SUM(taxes.amount)/100, 0) as an array
    *    aggregation, no join (:65-71)
    *  - first tax's behavior; is_tax_inclusive =
    *    COALESCE(behavior='inclusive', FALSE) (:73-86)
    *  - period-end fallback: missing period.end → period_start + 1
    *    day, flagged is_missing_period_end (:102-116)
    */
  def invoiceLineItems(stgInvoices: DataFrame, loadedAt: Column): DataFrame = {
    val flattened = stgInvoices
      .filter(col("status") === "paid")
      .select(
        col("id").as("invoice_id"),
        col("customer").as("customer_id"),
        col("subscription").as("invoice_subscription_id"),
        col("currency").as("invoice_currency"),
        timestamp_seconds(col("created").cast("long")).as("invoice_created_at"),
        col("created_at_date").as("invoice_created_date"),
        explode(col("lines.data")).as("li"))

    // try_element_at: NULL on empty/null arrays — the semantics of the
    // reference's `... FROM UNNEST(taxes) LIMIT 1` correlated subquery
    // (ANSI element_at would throw on empty taxes)
    val firstTax = try_element_at(col("li.taxes"), lit(1))
    val taxSum = aggregate(
      transform(col("li.taxes"), t => t.getField("amount").cast("double")),
      lit(0.0), (acc, x) => acc + x) / 100

    val periodStartDate = to_date(timestamp_seconds(col("li.period.start")))
    val periodEndRaw = to_date(timestamp_seconds(col("li.period.end")))

    flattened.select(
      col("li.id").as("line_item_id"),
      col("invoice_id"),
      col("customer_id"),
      coalesce(col("li.subscription"), col("invoice_subscription_id")).as("subscription_id"),
      col("li.type").as("line_item_type"),
      col("li.description").as("description"),
      (col("li.amount").cast("double") / 100).as("amount"),
      coalesce(col("li.currency"), col("invoice_currency")).as("currency"),
      col("li.quantity").cast("long").as("quantity"),
      col("invoice_created_at"),
      col("invoice_created_date"),
      timestamp_seconds(col("li.period.start")).as("period_start_at"),
      periodStartDate.as("period_start_date"),
      coalesce(taxSum, lit(0.0)).as("tax_amount"),
      firstTax.getField("tax_behavior").as("tax_behavior"),
      coalesce(firstTax.getField("tax_behavior") === "inclusive", lit(false)).as("is_tax_inclusive"),
      when(periodEndRaw.isNull, date_add(periodStartDate, 1))
        .otherwise(periodEndRaw).as("period_end_date"),
      periodEndRaw.isNull.as("is_missing_period_end"),
      to_json(col("li.metadata")).as("metadata"),
      loadedAt.as("_loaded_at"))
  }

  // ------------------------------------------------------------ marts
  /** Shared CTE chain of both marts (reference:
    * deferred_revenue.sql:19-72): tax-inclusive/exclusive revenue
    * split (:24-41), FX to USD (:43-56), service-period daily rate
    * with zero-length guard (:58-72). */
  private[pipeline] def revenueBase(lineItems: DataFrame,
                                    exchangeRates: DataFrame): DataFrame = {
    val rates = exchangeRates
      .filter(col("to_currency") === "USD")
      .select(col("from_currency"), col("exchange_rate"))

    val revenueCalculated = lineItems.select(
      col("line_item_id"), col("invoice_id"), col("customer_id"),
      col("subscription_id"), col("currency"),
      col("invoice_created_at"), col("invoice_created_date"),
      col("period_start_date"), col("period_end_date"),
      // tax-inclusive: the amount already contains tax — strip it.
      // tax-exclusive: amount is net — total adds tax on top.
      when(col("is_tax_inclusive"), col("amount") - col("tax_amount"))
        .otherwise(col("amount")).as("amount_without_tax"),
      when(col("is_tax_inclusive"), col("amount"))
        .otherwise(col("amount") + col("tax_amount")).as("amount_with_tax"))

    // 9-row dim → broadcast hash join, never a shuffle
    val rateExchanged = revenueCalculated
      .join(broadcast(rates), col("currency") === col("from_currency"), "inner")
      .withColumn("amount_without_tax_usd", col("amount_without_tax") * col("exchange_rate"))
      .withColumn("amount_with_tax_usd", col("amount_with_tax") * col("exchange_rate"))

    // service days = DATE_DIFF(end, start); float division — no
    // rounding, faithful to the reference (deferred_revenue.sql:62-69)
    rateExchanged
      .withColumn("service_period_days",
        datediff(col("period_end_date"), col("period_start_date")))
      .withColumn("daily_revenue_usd",
        when(col("service_period_days") <= 0, col("amount_without_tax_usd"))
          .otherwise(col("amount_without_tax_usd") / col("service_period_days")))
  }

  /** Deferred-revenue mart: one row per (line_item_id, as_of_date)
    * for invoice_created_date ≤ as_of_date ≤ period_end_date
    * (reference: deferred_revenue.sql:74-128; grain/unique key :3).
    *
    * The reference materializes the day expansion as CROSS JOIN
    * calendar + range bounds (:112-122) — a BroadcastNestedLoopJoin
    * in Spark. Re-expressed as explode(sequence(...)): linear,
    * shuffle-free, identical output (equivalence asserted in
    * IntervalExpandSpec/PipelineSpec).
    *
    * Proration (reference CASE :97-110, replicated branch-for-branch):
    * recognized = 0 before the service period, the full amount at/after
    * period end, otherwise daily_rate × DATE_DIFF(as_of, period_start)
    * — zero days elapse on the start day itself. deferred is computed
    * INDEPENDENTLY as daily_rate × DATE_DIFF(period_end, as_of) (the
    * reference's own CASE :97-102), not as amount − recognized: the two
    * differ in float ULPs and oracle parity requires the former.
    */
  def deferredRevenue(lineItems: DataFrame, exchangeRates: DataFrame,
                      loadedAt: Column): DataFrame = {
    val base = revenueBase(lineItems, exchangeRates)
    val expanded = IntervalExpand.expandDays(
      base, col("invoice_created_date"), col("period_end_date"), "as_of_date")

    val recognized =
      when(col("as_of_date") < col("period_start_date"), lit(0.0))
        .when(col("as_of_date") >= col("period_end_date"), col("amount_without_tax_usd"))
        .otherwise(col("daily_revenue_usd") *
          datediff(col("as_of_date"), col("period_start_date")))
    val deferred =
      when(col("as_of_date") < col("period_start_date"), col("amount_without_tax_usd"))
        .when(col("as_of_date") >= col("period_end_date"), lit(0.0))
        .otherwise(col("daily_revenue_usd") *
          datediff(col("period_end_date"), col("as_of_date")))

    expanded.select(
      col("line_item_id"), col("invoice_id"), col("customer_id"),
      col("subscription_id"), col("currency"),
      col("invoice_created_at"), col("invoice_created_date"),
      col("period_start_date"), col("period_end_date"),
      col("service_period_days"), col("daily_revenue_usd"),
      col("amount_without_tax_usd"), col("amount_with_tax_usd"),
      col("as_of_date"),
      recognized.as("recognized_revenue_usd"),
      deferred.as("deferred_revenue_usd"),
      loadedAt.as("_loaded_at"))
  }

  /** Recognized-revenue mart: one row per (line_item_id,
    * recognition_date) for the half-open service window
    * period_start_date ≤ d < period_end_date, carrying the daily
    * rate (reference intent: recognized_revenue.sql:70-97 — the
    * committed SQL is syntactically broken (SURVEY §7.4 risk 7); the
    * semantics are deferred_revenue.sql:58-123 restricted to the
    * half-open window :92-94 keeping daily_revenue_usd, which
    * README.md:206-213's Q4 sums). */
  def recognizedRevenue(lineItems: DataFrame, exchangeRates: DataFrame,
                        loadedAt: Column): DataFrame = {
    val base = revenueBase(lineItems, exchangeRates)
    IntervalExpand.expandDaysHalfOpen(
      base, col("period_start_date"), col("period_end_date"), "recognition_date")
      .select(
        col("line_item_id"), col("invoice_id"), col("customer_id"),
        col("subscription_id"), col("currency"),
        col("invoice_created_at"), col("invoice_created_date"),
        col("period_start_date"), col("period_end_date"),
        col("service_period_days"),
        col("recognition_date"),
        col("daily_revenue_usd"),
        col("amount_without_tax_usd"),
        loadedAt.as("_loaded_at"))
  }
}

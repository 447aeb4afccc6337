package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed row models for the curated/mart tables — `Dataset[T]` where
  * the schema is fixed and compile-time field checks pay off
  * (SURVEY §1.3: curated layer = explicit schemas; staging stays
  * DataFrame because its schema is open).
  */
object Rows {

  case class InvoiceLineItem(
      line_item_id: String,
      invoice_id: String,
      customer_id: String,
      subscription_id: Option[String],
      line_item_type: Option[String],
      description: Option[String],
      amount: Double,
      currency: String,
      quantity: Option[Long],
      invoice_created_at: Timestamp,
      invoice_created_date: Date,
      period_start_at: Timestamp,
      period_start_date: Date,
      tax_amount: Double,
      tax_behavior: Option[String],
      is_tax_inclusive: Boolean,
      period_end_date: Date,
      is_missing_period_end: Boolean,
      metadata: Option[String],
      _loaded_at: Timestamp)

  case class DeferredRevenueRow(
      line_item_id: String,
      invoice_id: String,
      customer_id: String,
      subscription_id: Option[String],
      currency: String,
      invoice_created_at: Timestamp,
      invoice_created_date: Date,
      period_start_date: Date,
      period_end_date: Date,
      service_period_days: Int,
      daily_revenue_usd: Double,
      amount_without_tax_usd: Double,
      amount_with_tax_usd: Double,
      as_of_date: Date,
      recognized_revenue_usd: Double,
      deferred_revenue_usd: Double,
      _loaded_at: Timestamp)

  case class RecognizedRevenueRow(
      line_item_id: String,
      invoice_id: String,
      customer_id: String,
      subscription_id: Option[String],
      currency: String,
      invoice_created_at: Timestamp,
      invoice_created_date: Date,
      period_start_date: Date,
      period_end_date: Date,
      service_period_days: Int,
      recognition_date: Date,
      daily_revenue_usd: Double,
      amount_without_tax_usd: Double,
      _loaded_at: Timestamp)

  def lineItems(df: DataFrame): Dataset[InvoiceLineItem] = {
    import df.sparkSession.implicits._
    df.as[InvoiceLineItem]
  }
  def deferred(df: DataFrame): Dataset[DeferredRevenueRow] = {
    import df.sparkSession.implicits._
    df.as[DeferredRevenueRow]
  }
  def recognized(df: DataFrame): Dataset[RecognizedRevenueRow] = {
    import df.sparkSession.implicits._
    df.as[RecognizedRevenueRow]
  }
}

package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit read schemas for the three raw Stripe NDJSON sources.
  *
  * The reference lets BigQuery auto-detect the external-table schema
  * (reference: dbt/stripe/models/external_tables.yml:4-19); at 100 TB
  * inference is both nondeterministic and a full extra pass, so the
  * engine declares the shape (fields per FIXTURES.md §A, mirroring
  * what the curated models consume — invoices.sql:16-53,
  * invoice_line_items.sql:16-91). Unknown extra fields are dropped by
  * the schema'd read, matching "staging keeps what we declare".
  */
object Schemas {

  val taxSchema: StructType = StructType(Seq(
    StructField("amount", LongType),
    StructField("tax_behavior", StringType)))

  val lineItemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("description", StringType),
    StructField("amount", LongType),
    StructField("currency", StringType),
    StructField("quantity", LongType),
    StructField("subscription", StringType),
    StructField("period", StructType(Seq(
      StructField("start", LongType),
      StructField("end", LongType)))),
    StructField("taxes", ArrayType(taxSchema)),
    StructField("metadata", MapType(StringType, StringType))))

  val invoiceSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("customer", StringType),
    StructField("subscription", StringType),
    StructField("status", StringType),
    StructField("currency", StringType),
    StructField("created", LongType),
    StructField("amount_due", LongType),
    StructField("amount_paid", LongType),
    StructField("amount_remaining", LongType),
    StructField("subtotal", LongType),
    StructField("total", LongType),
    StructField("tax", LongType),
    StructField("collection_method", StringType),
    StructField("period_start", LongType),
    StructField("period_end", LongType),
    StructField("automatic_tax", StructType(Seq(
      StructField("enabled", BooleanType),
      StructField("status", StringType)))),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("lines", StructType(Seq(
      StructField("data", ArrayType(lineItemSchema)))))))

  val subscriptionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("customer", StringType),
    StructField("status", StringType),
    StructField("created", LongType),
    StructField("current_period_start", LongType),
    StructField("current_period_end", LongType)))

  val subscriptionUpdateSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("created", LongType)))
}

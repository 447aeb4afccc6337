package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to Spark's internal Jackson JSON-line parser (package-
  * private under org.apache.spark.sql) for the engine's DataSource V2
  * NDJSON source. Produces a line → InternalRow parser that applies
  * pushed filters DURING parsing (Spark's own JSON source does the
  * same), so non-matching records never materialize.
  */
object JsonBridge {
  /** @param dropMalformed true → a malformed line yields no rows
    *                      (DROPMALFORMED); false → it fails the task
    *                      with the offending line in the message
    *                      (FAILFAST — the default: silent drops hide
    *                      upstream corruption). The raw parser throws
    *                      `BadRecordException`, which is private[sql] —
    *                      caught here inside the bridge namespace. */
  def lineParser(schema: StructType, pushedFilters: Seq[Filter],
                 dropMalformed: Boolean): String => Iterator[InternalRow] = {
    val options = new JSONOptions(Map.empty[String, String], "UTC")
    val parser = new JacksonParser(schema, options,
      allowArrayAsStructs = false, pushedFilters)
    (line: String) =>
      try parser.parse(UTF8String.fromString(line),
        CreateJacksonParser.utf8String, identity[UTF8String]).iterator
      catch {
        case e: org.apache.spark.sql.catalyst.util.BadRecordException =>
          if (dropMalformed) Iterator.empty
          else throw new IllegalArgumentException(
            s"Malformed NDJSON line (use .option(\"mode\", \"dropmalformed\") " +
              s"to skip): ${line.take(200)}", e)
      }
  }
}

/** Opaque serializable Hadoop Configuration carrier for DSv2 reader
  * factories (the underlying `SerializableConfiguration` is
  * private[spark], so it is wrapped here inside the bridge
  * namespace). Hadoop `Configuration` itself is not Serializable;
  * a reader factory that closes over one directly fails to ship to
  * executors. */
class SerializableHadoopConf(conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private val inner = new org.apache.spark.util.SerializableConfiguration(conf)
  def value: org.apache.hadoop.conf.Configuration = inner.value
}

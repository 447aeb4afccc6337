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
  def lineParser(schema: StructType,
                 pushedFilters: Seq[Filter]): String => Iterator[InternalRow] = {
    val options = new JSONOptions(Map.empty[String, String], "UTC")
    val parser = new JacksonParser(schema, options,
      allowArrayAsStructs = false, pushedFilters)
    (line: String) =>
      parser.parse(UTF8String.fromString(line),
        CreateJacksonParser.utf8String, identity[UTF8String]).iterator
  }
}

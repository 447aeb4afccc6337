package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-evolution-tolerant reads — the source-side reality of a
  * long-lived ingest directory: yesterday's batches have fewer
  * columns, older batches carry narrower types (int ids that became
  * long), some writers added fields nobody declared. Spark's own
  * `mergeSchema` refuses type changes outright (int vs long fails the
  * merge), and a bare union would silently positional-match columns.
  *
  * [[readEvolved]] reads each batch with ITS OWN schema and aligns it
  * to the caller's canonical schema:
  *  - missing columns surface as typed NULLs (the semantics of "this
  *    field did not exist yet");
  *  - present columns cast to the canonical type — by default only
  *    WIDENING casts (`Cast.canUpCast`: int→long, float→double,
  *    date→timestamp …) are accepted, because a silent narrowing
  *    (long id → int) is data corruption; `strict = false` downgrades
  *    to any legal cast for the caller who knows better;
  *  - columns outside the canonical schema are dropped (declared
  *    surface only — an undeclared column reaching downstream code is
  *    how schema drift propagates);
  *  - an incompatible type (string where long is declared) refuses
  *    LOUDLY with the path and column named, at plan time.
  *
  * Scale shape: one parquet scan per batch directory unioned by name
  * — column pruning and filter pushdown still reach every scan
  * (alignment is a projection); no data is rewritten. For thousands
  * of daily directories, group them by actual schema first (the
  * listing is driver-side anyway) or compact old days.
  */
object Evolve {

  def readEvolved(spark: SparkSession, paths: Seq[String],
                  canonical: StructType,
                  strict: Boolean = true): DataFrame = {
    require(paths.nonEmpty, "readEvolved needs at least one path")
    paths.map { p =>
      val df = spark.read.parquet(p)
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      val aligned = canonical.map { f =>
        have.get(f.name) match {
          case None => lit(null).cast(f.dataType).as(f.name)
          case Some(dt) if dt == f.dataType => col(f.name)
          case Some(dt) =>
            val ok = if (strict) Cast.canUpCast(dt, f.dataType)
            else Cast.canCast(dt, f.dataType)
            require(ok,
              s"readEvolved: column '${f.name}' at $p has type $dt, " +
                s"canonical wants ${f.dataType} — " +
                (if (strict && Cast.canCast(dt, f.dataType))
                  "a NARROWING cast (possible data corruption); pass " +
                    "strict = false only if the narrowing is known-safe"
                else "no legal cast exists; fix the writer or the schema"))
            col(f.name).cast(f.dataType).as(f.name)
        }
      }
      df.select(aligned: _*)
    }.reduce(_.unionByName(_))
  }
}

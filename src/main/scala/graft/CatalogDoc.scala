package graft

import java.nio.file.{Files, Paths}

import graft.queries.Catalog

/** Generates docs/CATALOG.md — the operator-query inventory — from
  * Catalog.all, so the documented surface can never drift from the
  * code (regenerate after adding a query: `sbt "runMain graft.CatalogDoc"`). */
object CatalogDoc {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/CATALOG.md")
    val rows = Catalog.all.map { q =>
      val check = if (q.oracle.isDefined) "DuckDB hash-compare" else "rows-only (spec-bounded)"
      s"| `${q.name}` | ${q.description.replace("|", "\\|")} | $check |"
    }
    // no stripMargin: the generated table rows begin with '|', which
    // stripMargin would consume as its margin character
    val md =
      "# Query catalog (generated — `sbt \"runMain graft.CatalogDoc\"`)\n\n" +
        s"${Catalog.all.size} queries, each co-located with its oracle in\n" +
        "`src/main/scala/graft/queries/Catalog.scala`. \"DuckDB hash-compare\"\n" +
        "means the driver executes the paired SQL in DuckDB over the same\n" +
        "inputs and compares values exactly; \"rows-only\" queries use\n" +
        "engine-seeded hashes or sketches no other engine reproduces, and\n" +
        "their correctness claims live in ScalaTest specs instead.\n\n" +
        "| Query | What it covers | Correctness check |\n" +
        "|---|---|---|\n" +
        rows.mkString("\n") + "\n"
    Files.writeString(Paths.get(out), md)
    println(s"wrote $out (${Catalog.all.size} queries)")
  }
}

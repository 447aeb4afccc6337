package graft

import graft.queries.Catalog

/** Corpus data-card main: runs the oracle-pinned q199 profile over a
  * corpus directory and prints the card as one JSON line — the
  * release-note report for a curated dataset.
  *
  * `sbt "runMain graft.DataCard [sfDir]"`
  */
object DataCard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    val row = Catalog.all.find(_.name == "q199_corpus_card").get
      .fn(spark, sfDir).head()
    val fields = row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      val v = row.get(i) match {
        case s: String => Json.str(s)
        case other     => String.valueOf(other)
      }
      s"${Json.str(n)}:$v"
    }
    println(fields.mkString(s"""{"card":${Json.str(sfDir)},""", ",", "}"))
    spark.stop()
  }
}

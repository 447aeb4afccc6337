package graft.operators

import graft.SparkSpecBase

/** The executable driver-read contract: within-bound reads pass rows
  * through; a violated bound fails loudly carrying the caller's
  * justification, after pulling at most one extra row. */
class BoundedReadSpec extends SparkSpecBase {
  import spark.implicits._

  test("within the bound: all rows come back") {
    val rows = BoundedRead.boundedDriverRead(
      (1 to 5).toDF("x"), maxRows = 5, what = "spec", boundWhy = "5 rows")
    assert(rows.map(_.getInt(0)).sorted === Array(1, 2, 3, 4, 5))
  }

  test("over the bound: loud failure naming the site and its justification") {
    val e = intercept[IllegalArgumentException] {
      BoundedRead.boundedDriverRead((1 to 10).toDF("x"),
        maxRows = 3, what = "spec-site", boundWhy = "three is company")
    }
    assert(e.getMessage.contains("spec-site"), e.getMessage)
    assert(e.getMessage.contains("three is company"), e.getMessage)
  }
}

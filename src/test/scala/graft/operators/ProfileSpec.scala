package graft.operators

import graft.SparkSpecBase

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("summarize profiles every column in one pass, nulls handled") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("c")),
      (None, Some("a"))
    ).toDF("k", "s")
    val out = Profile.summarize(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("k") === (("k", 4L, 1L, 2L, "1", "2")))
    assert(out("s") === (("s", 4L, 1L, 2L, "a", "c")))
    // exactly one row per profiled column, nothing else
    assert(out.keySet === Set("k", "s"))
  }
}

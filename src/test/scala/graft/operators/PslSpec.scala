package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PslSpec extends SparkSpecBase {
  import spark.implicits._

  private def rd(host: String): String =
    Seq(host).toDF("h").select(Psl.registeredDomain(col("h")))
      .as[String].head()

  test("snapshot parses: exact + wildcard + exception rules all present") {
    val r = Psl.snapshot
    assert(r.exact.contains("co.uk"))
    assert(r.exact.contains("github.io"))
    assert(r.exact.contains("blogspot.com"))
    assert(r.exact.contains("k12.ca.us"))
    assert(r.wildcard.contains("ck"))
    assert(r.wildcard.contains("compute.amazonaws.com"))
    assert(r.exception.contains("www.ck"))
    assert(r.maxLabels >= 3)
  }

  test("platform suffixes: each *.github.io site is its own registered domain") {
    assert(rd("alice.github.io") === "alice.github.io")
    assert(rd("docs.alice.github.io") === "alice.github.io")
    assert(rd("bob.blogspot.com") === "bob.blogspot.com")
    assert(rd("deep.a.bob.blogspot.com") === "bob.blogspot.com")
    // the old 13-suffix subset collapsed all of these to github.io —
    // the exact failure the snapshot exists to prevent
    assert(rd("alice.github.io") !== rd("carol.github.io"))
  }

  test("longest match prevails: k12.ca.us beats ca.us beats default") {
    assert(rd("school.k12.ca.us") === "school.k12.ca.us")
    assert(rd("www.school.k12.ca.us") === "school.k12.ca.us")
    assert(rd("thing.ca.us") === "thing.ca.us")
    assert(rd("sub.thing.ca.us") === "thing.ca.us")
  }

  test("wildcard rules: any label under *.ck / *.compute.amazonaws.com is a suffix") {
    assert(rd("shop.biz.ck") === "shop.biz.ck")
    assert(rd("x.shop.biz.ck") === "shop.biz.ck")
    assert(rd("vm1.eu-west-1.compute.amazonaws.com") ===
      "vm1.eu-west-1.compute.amazonaws.com")
    assert(rd("api.vm1.eu-west-1.compute.amazonaws.com") ===
      "vm1.eu-west-1.compute.amazonaws.com")
  }

  test("exception rule: !www.ck escapes the *.ck wildcard") {
    assert(rd("www.ck") === "www.ck")
    assert(rd("sub.www.ck") === "www.ck")
  }

  test("default rule: unknown TLD is a one-label suffix") {
    assert(rd("example.zz") === "example.zz")
    assert(rd("deep.sub.example.zz") === "example.zz")
  }

  test("passthrough: bare suffixes, single labels, IP literals, empties") {
    assert(rd("co.uk") === "co.uk")          // host IS a public suffix
    assert(rd("github.io") === "github.io")
    assert(rd("biz.ck") === "biz.ck")        // wildcard-made suffix
    assert(rd("localhost") === "localhost")
    assert(rd("192.168.0.1") === "192.168.0.1")
    assert(rd("2001:db8::1") === "2001:db8::1")
    assert(rd("") === "")
    assert(rd("example.com.") === "example.com") // trailing-dot FQDN
  }

  test("extraRules merge over the snapshot and are instance-scoped") {
    val out = Seq("a.site.corp.internal", "b.other.com").toDF("h")
      .select(Psl.registeredDomain(col("h"),
        extraRules = Seq("corp.internal")).as("d"))
      .as[String].collect().toSeq
    assert(out === Seq("site.corp.internal", "other.com"))
    // without the extra rule, 'internal' falls to the one-label default
    assert(rd("a.site.corp.internal") === "corp.internal")
  }

  test("parse: comments, blanks, trailing tokens, bare * all handled") {
    val r = Psl.parse(Iterator(
      "// comment", "", "  com  // inline", "*.dev", "!keep.dev", "*"))
    assert(r.exact === Set("com"))
    assert(r.wildcard === Set("dev"))
    assert(r.exception === Set("keep.dev"))
  }

  test("SQL surface: graft_registered_domain") {
    graft.functions.SqlFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_registered_domain('docs.alice.github.io') AS d")
      .as[String].head()
    assert(got === "alice.github.io")
  }

  test("null host stays null through the expression") {
    val got = Seq[Option[String]](None).toDF("h")
      .select(Psl.registeredDomain(col("h"))).collect()
    assert(got.head.isNullAt(0))
  }
}

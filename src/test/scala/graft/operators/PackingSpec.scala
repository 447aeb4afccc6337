package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, 10 + (i % 7) * 5))
    .toDF("id", "n_tok")

  test("packGreedy: deterministic, shard-local, bins filled in hash order") {
    val a = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .orderBy("doc_id").collect()
    val b = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 100, shards = 4)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)                      // deterministic
    val rows = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).distinct.sorted === Seq(0L, 1L, 2L, 3L))
    // within a shard: seq_in_shard is 1..n, cum_tokens strictly grows,
    // bins are non-decreasing and start at the doc's first token
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byOrder = rs.sortBy(_._3)
      assert(byOrder.map(_._3).toSeq === (1L to byOrder.length).toSeq)
      assert(byOrder.map(_._4).toSeq === byOrder.map(_._4).sorted.toSeq)
      // explicit recompute of the packing from scratch
      var running = 0L
      byOrder.foreach { case (id, _, _, cum, bin) =>
        val n = docs.filter($"id" === id).head().getLong(1)
        assert(cum === running + n, s"cum for doc $id")
        assert(bin === running / 100, s"bin for doc $id")
        running += n
      }
    }
  }

  test("packGreedy bins respect the token budget at the assignment grain") {
    // ctx larger than total tokens → everything lands in bin 0
    val one = Packing.packGreedy(docs, "id", "n_tok", ctxLen = 1 << 20, shards = 2)
    assert(one.filter($"bin" =!= 0).count() === 0)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: keeps the k (score, id) pairs with the
  * highest score (ties broken by smaller id) using a size-capped
  * buffer.
  *
  * Why an Aggregator and not a window: `row_number() OVER
  * (PARTITION BY query)` materializes and SORTS the full partition —
  * for a per-query neighbor ranking that partition is the whole
  * corpus, i.e. a single task holding N rows at 100 TB. A typed
  * Aggregator participates in partial (map-side) aggregation: every
  * scan partition reduces to ≤ k candidates locally, the shuffle
  * carries k × partitions tiny rows per query, and the final merge is
  * O(k · partitions · log k). Same result, no corpus-sized sort, no
  * single-task skew.
  *
  * Ranking order matches the engine's deterministic top-k contract:
  * score DESC, id ASC — callers round the score first so ranking is
  * engine-independent.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  /** better(x, y): x strictly outranks y. */
  private def better(x: (Double, Long), y: (Double, Long)): Boolean =
    x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      a: (Double, Long)): List[(Double, Long)] = insert(buf, a)

  override def merge(b1: List[(Double, Long)],
                     b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  /** Insert keeping the buffer sorted best-first and capped at k.
    * NaN scores are rejected outright: better() is false in BOTH
    * directions for NaN, so a NaN candidate would otherwise insert at
    * the head and evict a genuine neighbor. */
  private def insert(buf: List[(Double, Long)],
                     a: (Double, Long)): List[(Double, Long)] = {
    if (a._1.isNaN) return buf
    val (front, back) = buf.span(better(_, a))
    if (front.length >= k) buf else (front ::: a :: back).take(k)
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKAggregator]] with a double payload riding each (score, id)
  * pair — for bounded selections that must CARRY a measure with the
  * winner (the hash-reservoir sample sketch keeps the sampled VALUE
  * next to the selecting hash). Same partial-aggregation scale shape
  * and the same score-DESC/id-ASC determinism; the payload never
  * influences ranking. */
class TopKVAggregator(k: Int)
    extends Aggregator[(Double, Long, Double), List[(Double, Long, Double)],
      Seq[(Double, Long, Double)]] {
  require(k > 0, "k must be positive")

  private def better(x: (Double, Long, Double),
                     y: (Double, Long, Double)): Boolean =
    x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

  override def zero: List[(Double, Long, Double)] = Nil

  override def reduce(buf: List[(Double, Long, Double)],
                      a: (Double, Long, Double)): List[(Double, Long, Double)] =
    insert(buf, a)

  override def merge(b1: List[(Double, Long, Double)],
                     b2: List[(Double, Long, Double)]): List[(Double, Long, Double)] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[(Double, Long, Double)],
                     a: (Double, Long, Double)): List[(Double, Long, Double)] = {
    if (a._1.isNaN) return buf
    val (front, back) = buf.span(better(_, a))
    if (front.length >= k) buf else (front ::: a :: back).take(k)
  }

  override def finish(buf: List[(Double, Long, Double)]): Seq[(Double, Long, Double)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long, Double)]] =
    ExpressionEncoder[List[(Double, Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] =
    ExpressionEncoder[Seq[(Double, Long, Double)]]()
}

object TopK {
  /** Column aggregate: top_k(score, id) → array<struct<_1 double, _2 bigint>>
    * sorted best-first. */
  def top_k(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k)).apply(score, id)

  /** Column aggregate: top_kv(score, id, payload) →
    * array<struct<_1 double, _2 bigint, _3 double>> sorted best-first. */
  def top_kv(k: Int)(score: Column, id: Column, payload: Column): Column =
    udaf(new TopKVAggregator(k)).apply(score, id, payload)
}

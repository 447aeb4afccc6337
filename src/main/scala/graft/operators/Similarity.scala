package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Sketches, TopK}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set
  *    against the (huge) corpus, score every pair with a codegen'd
  *    dot-product HOF, keep top-k per query with a window. The
  *    corpus-side scan is embarrassingly parallel and shuffle-free up
  *    to the final per-query top-k, whose input is already cut to k
  *    rows per (query, partition) by `rank-local` pre-filtering —
  *    at 1000 executors the shuffle carries ≤ queries × k × partitions
  *    tiny rows, not the corpus.
  *  - `ivfTopK`: approximate scale path — coarse-quantize the corpus
  *    to its nearest centroid once (any deterministic centroid set),
  *    then probe only `nProbe` nearest cells per query: a partition-
  *    pruned fraction of the corpus instead of all of it. This is the
  *    standard IVF-flat layout; with the corpus written partitioned by
  *    `cell`, probing is literal partition pruning on the parquet
  *    scan.
  */
object Similarity {

  /** Dot product of two float-array columns (accumulated in double,
    * left-to-right — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0.0 when either vector has zero norm.
    * Codegen'd CosineSimilarityF expression — a tight compiled loop
    * over the float arrays, accumulated in double. */
  def cosine(a: Column, b: Column): Column = Sketches.cosine_f(a, b)

  /** HOF reference implementation of cosine (kept as the correctness
    * oracle for CosineSimilarityF in SimilaritySpec). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Symmetric int8 scalar quantization scale for a float vector:
    * max|x| / 127, so round(x / scale) lands in [-127, 127]. NULL for
    * an all-zero or empty vector (nothing to quantize). Exact-integer
    * determinism: max and abs are exact on floats, the division is
    * one double op — every engine computes the identical scale. */
  def int8Scale(vec: Column): Column = {
    val m = array_max(transform(vec, x => abs(x.cast("double"))))
    when(m.isNull || m === 0.0, lit(null).cast("double"))
      .otherwise(m / 127.0)
  }

  /** Int8-quantized codes for a float vector under [[int8Scale]]:
    * round(x / scale) per element (ties away from zero, matching
    * standard SQL ROUND). Empty/zero vectors quantize to all-zero
    * codes.
    *
    * The scale is bound through a one-element outer `transform` so it
    * evaluates ONCE per row: referencing the scale expression directly
    * inside the inner lambda would re-evaluate the array_max per
    * element — the HOF re-evaluation trap (see dot/l2Norm, which avoid
    * it by construction). */
  def quantizeInt8(vec: Column): Column =
    element_at(
      transform(array(int8Scale(vec)), s =>
        when(s.isNull, transform(vec, _ => lit(0).cast("int")))
          .otherwise(transform(vec, x => round(x.cast("double") / s).cast("int")))),
      1)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the big side, scanned once
    * @param queries (idCol, vecCol) — the small side, broadcast
    * @param k       neighbors per query (self-matches excluded)
    * @return (query_id, neighbor_id, cos) — cosine rounded to
    *         `roundTo` decimals before ranking so ranking is stable
    *         across summation orders; ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundTo: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), roundTo).as("cos"))
    topKPerKey(scored, "query_id", k)
  }

  /** Final ranking via the bounded-heap TopKAggregator, NOT a window:
    * row_number over a per-query partition sorts the entire corpus in
    * one task at scale, while the aggregator reduces each scan
    * partition to ≤ k candidates map-side — the shuffle carries
    * k × partitions rows per query. */
  private def topKPerKey(scored: DataFrame, keyCol: String, k: Int): DataFrame =
    scored.groupBy(col(keyCol))
      .agg(TopK.top_k(k)(col("cos"), col("neighbor_id")).as("top"))
      .select(col(keyCol), explode(col("top")).as("t"))
      .select(col(keyCol), col("t._2").as("neighbor_id"), col("t._1").as("cos"))

  /** Assign each corpus vector to its nearest centroid (IVF coarse
    * quantization). Centroids broadcast; the per-vector argmax is a
    * map-side max_by aggregation (partial agg keeps one candidate per
    * vector per partition) — no window sort of the corpus × centroids
    * product. Ties break to the smaller cell id. */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val cents = broadcast(centroids.select(
      col(idCol).as("cell"), col(vecCol).as("cent_vec")))
    corpus.join(cents)
      .select(col(idCol), col(vecCol),
        col("cell"), cosine(col(vecCol), col("cent_vec")).as("sim"))
      .groupBy(col(idCol))
      .agg(
        first(col(vecCol)).as(vecCol),
        max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"))
      .select(col(idCol), col(vecCol), col("cell"))
  }

  /** IVF top-k: probe the `nProbe` most-similar cells per query, then
    * exact-score only corpus vectors in those cells. */
  def ivfTopK(corpusWithCells: DataFrame, centroids: DataFrame,
              queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    val cents = broadcast(centroids.select(
      col(idCol).as("cell"), col(vecCol).as("cent_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    // top-nProbe cells per query (tiny: |queries| × |centroids|)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_sim").desc, col("cell").asc)
    val probes = q.join(cents)
      .select(col("query_id"), col("qvec"), col("cell"),
        cosine(col("qvec"), col("cent_vec")).as("cell_sim"))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell"))
    // scan only probed cells (partition-prunable when stored by cell)
    val c = corpusWithCells.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("cell"))
    val scored = c.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("cvec")), roundTo).as("cos"))
    topKPerKey(scored, "query_id", k)
  }
}

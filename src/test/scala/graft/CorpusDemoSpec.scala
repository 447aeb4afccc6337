package graft

import org.apache.spark.sql.functions._

/** Pins the end-to-end corpus demo at sf0.001: stage counts obey the
  * pipeline algebra, the split is cluster-safe, the mixture respects
  * its budgets, and the store survives compaction. */
class CorpusDemoSpec extends SparkSpecBase {

  private lazy val sfDir = "/root/testdata/sf0.001"
  private lazy val outDir =
    s"${System.getProperty("java.io.tmpdir")}/graft-corpus-demo-spec"

  test("corpus demo: stage algebra, split totals, budget ceiling, store probes") {
    val nBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val r = CorpusDemo.run(spark, sfDir, outDir)
    // ingest plants one exact copy per id%10==0 doc...
    assert(r.nIngested === nBase + (nBase + 9) / 10)
    // ...and exact dedup removes exactly those copies (min-id keeps
    // the original; synthetic texts are otherwise distinct)
    assert(r.nExact === nBase)
    // monotone pipeline: each stage only drops
    assert(r.nExact >= r.nNear && r.nNear >= r.nClean &&
      r.nClean >= r.nFresh && r.nFresh >= r.nLm && r.nLm >= r.nQuality)
    // every operator in the chain is deterministic (md5 splits, seeded
    // hashes, exact verify) — the sf0.001 stage counts are pinned
    // exactly; a change here means an operator changed semantics.
    // repetition_filter drops exactly the 6 gram-level remixes
    // (shared_frac > 0.5) that survive pairwise near-dedup;
    // lm_filter drops the 13 docs whose bigram perplexity under the
    // lang='en' reference model exceeds 380
    assert((r.nNear, r.nClean, r.nFresh, r.nLm, r.nQuality, r.nClusters) ===
      ((58L, 57L, 51L, 38L, 13L, 21L)), s"stage counts moved: $r")
    // dedup certification: the source-blocked dedup's own claim (no
    // within-source pair ≥ t survives) is exactly proven; the cross-
    // source residual quantifies the blocking tradeoff on this
    // template-heavy corpus
    assert(r.nResidualWithin === 0L, s"blocked-dedup claim broken: $r")
    assert(r.nResidualCross === 181L, s"blocking-tradeoff count moved: $r")
    assert(r.splitCounts === Map("train" -> 11L, "val" -> 2L))
    assert((r.nMixture, r.mixtureTokens, r.nPacks) === ((11L, 553L, 6L)))
    // split partitions the quality set exactly
    assert(r.splitCounts.values.sum === r.nQuality)
    assert(r.splitCounts.keySet.subsetOf(Set("train", "val", "test")))
    // mixture selects from train only, never exceeds the per-source
    // budget sum; curriculum is a reordering of the mixture
    assert(r.nMixture <= r.splitCounts.getOrElse("train", 0L))
    assert(r.nCurriculum === r.nMixture)
    assert(r.nPacks >= 1L)
    // attrition funnel is exactly the stage algebra, per record
    assert(r.attrition.values.sum === r.nIngested)
    assert(r.attrition.getOrElse("exact_dedup", 0L) === r.nIngested - r.nExact)
    assert(r.attrition.getOrElse("near_dedup", 0L) === r.nExact - r.nNear)
    assert(r.attrition.getOrElse("decontaminate", 0L) === r.nNear - r.nClean)
    assert(r.attrition.getOrElse("repetition", 0L) === r.nClean - r.nFresh)
    assert(r.attrition.getOrElse("lm_ppl", 0L) === r.nFresh - r.nLm)
    assert(r.attrition.getOrElse("quality", 0L) === r.nLm - r.nQuality)
    assert(r.attrition.getOrElse("survived", 0L) === r.nMixture)
    // tier report covers the mixture, three balanced-ish tiers
    assert(r.tierCounts.values.sum === r.nMixture)
    assert(r.tierCounts.keySet.subsetOf(Set(0L, 1L, 2L)))
    // the written epoch order holds the whole mixture
    assert(r.nShuffled === r.nMixture)
    // per-stage wall clock: every pipeline stage reports a positive
    // timing, in pipeline order (the sf0.1 scaling record's raw data)
    assert(r.stageSec.map(_._1) === Seq("ingest", "exact_dedup",
      "near_dedup_cc", "near_dedup_filter", "certify_dedup", "decontaminate",
      "repetition_filter", "lm_filter", "quality_filter",
      "cluster_safe_split",
      "budgeted_mixture", "rank_tiers", "curriculum",
      "epoch_order_write", "pack", "kmv_store", "attrition"))
    assert(r.stageSec.forall(_._2 > 0.0))
    // store: one KMV store compacted, one probe row per source
    assert(r.storesCompacted === 1)
    assert(r.kmvProbes ===
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("source").distinct().count())
    GraftSession.sweepPersistedRdds(spark)
    ()
  }
}

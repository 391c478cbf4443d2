package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Driver-contract drift guards: every catalog entry must either carry
 * oracle SQL (the driver's DuckDB gate) or appear on the documented
 * no-oracle allowlist with a self-consistency gate in a spec. A new
 * operator landing without an oracle fails HERE, not silently as a
 * weaker rows-only row in the next round's correctness report.
 */
class CatalogSpec extends AnyFunSuite {

  /** Hash-sketch / codebook / probabilistic rows DuckDB cannot replay;
    * each one's gate lives in PipelineSpec / QuantizeSpec / CurationSpec. */
  private val noOracleAllowlist = Set(
    "p05_minhash_pairs",       // xxhash64 chain — PipelineSpec est-vs-exact + recall
    "p15_minhash_oph",         // same chain, OPH fold — PipelineSpec
    "p06_simhash_pairs",       // xxhash64 bit votes — PipelineSpec brute-force radius
    "p08_fingerprint",         // rolling-hash — PipelineSpec determinism
    "p09_ivf_topk",            // trained centroids — PipelineSpec recall floor
    "p14_srp_neardup",         // random projections — PipelineSpec recall vs exact
    "p29_pq_topk",             // Lloyd codebooks — QuantizeSpec recall + fidelity
    "p31_contamination_bloom", // probabilistic membership — CurationSpec recall 1
    "p34_ivf_pq_serve",        // IVF+PQ serving — PipelineSpec recall + pruned-plan gates
    "p96_ivf_pq_refresh",      // maintained IVF+PQ — PipelineSpec MoR≡re-encode + recall + gen-2 + retrain gates
    "p52_neardup_incremental") // persisted OPH index — PipelineSpec ≡ minhashPairsOph + planted-dup gates
  // p44 left this list in r7: the whitened norm is basis-invariant, so the
  // 2-d slice has a closed-form DuckDB twin (2×2 (Σ+εI)⁻¹ Mahalanobis);
  // the n-d per-component path stays gated in QuantizeSpec

  test("every query has oracle SQL or a documented self-consistency gate") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = queries -- oracles -- noOracleAllowlist
    assert(missing.isEmpty,
      s"catalog entries without oracle SQL or allowlist entry: ${missing.toSeq.sorted}")
  }

  test("no orphan oracle SQL or stale allowlist rows") {
    val queries = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- queries
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.toSeq.sorted}")
    val stale = noOracleAllowlist -- queries
    assert(stale.isEmpty, s"allowlist rows without a query: ${stale.toSeq.sorted}")
    val doubled = noOracleAllowlist.intersect(SparkEntry.oracleSql.keySet)
    assert(doubled.isEmpty, s"allowlisted rows that DO have oracles now: ${doubled.toSeq.sorted}")
  }
}

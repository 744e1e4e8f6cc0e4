package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Dedup, Similarity}

/** Structural pins for the contracted DuckDB replay registry (round
  * 19) — the SQL that lets tools/cc_check.py attest every formerly
  * 20×-carried oracle directly at 100×. Value correctness is proven by
  * cc_check.py itself (sf0.01 + 100×, both EXCEPT directions); these
  * pin the REGISTRY SHAPE so a refactor can't silently drop a frame or
  * decouple a contracted oracle from its certified downstream text.
  */
class CcReplaySpec extends AnyFunSuite {

  private val pairFamily = Set("pairs_exact", "pairs_lsh",
    "d2_jaccard_pairs", "d3_lsh_pairs", "d11_lsh_verify",
    "d16_containment", "d6_dedup_corpus", "d13_chunk_dedup",
    "d14_lsh_recall", "d17_edit_verify", "d18_incremental_dedup",
    "d20_dup_pagerank", "d23_source_overlap", "d25_substring_spans",
    "d28_substring_excision")
  private val compFamily = Set("d7_dup_components", "d10_best_keeper",
    "d21_leakage_split", "d26_lsh_dedup_components", "d27_lsh_keeper",
    "d32_dup_weights", "d33_effective_tokens",
    "d34_incremental_components", "d35_dedup_audit")

  test("every formerly 20x-carried oracle has a contracted replay") {
    val replay = Dedup.ccReplaySql ++ Similarity.ccReplaySql
    val expected = pairFamily ++ compFamily + "d19_semantic_dedup"
    assert(replay.keySet == expected,
      s"missing: ${expected -- replay.keySet}; " +
        s"unexpected: ${replay.keySet -- expected}")
  }

  test("contracted comp oracles differ from the certified SQL ONLY in the closure") {
    // undoing the prologue swap must reproduce the certified oracle
    // text byte-for-byte — the replay's downstream (the part the
    // sf0.01/20x certification graded) is verbatim
    val replay = Dedup.ccReplaySql
    for (n <- compFamily) {
      val contracted = replay(n)
      assert(contracted.contains("rreach"),
        s"$n: contracted replay must use the rep-level closure")
      val undone = Dedup.contractionSwaps.foldLeft(contracted) {
        case (s, (certifiedP, contractedP)) =>
          s.replace(contractedP, certifiedP)
      }
      assert(undone == Dedup.oracle(n),
        s"$n: replay must differ from the certified oracle only in " +
          "the swapped comp prologue")
    }
  }

  test("every contracted replay groups before it pairs") {
    // the whole point: DuckDB cost must scale with DISTINCT contents —
    // every pair-family replay derives from a GROUP BY collapse (skey
    // groups or text groups), never a raw doc-level self-join
    val replay = Dedup.ccReplaySql ++ Similarity.ccReplaySql
    for ((n, sql) <- replay) {
      assert(sql.contains("GROUP BY skey") || sql.contains("GROUP BY text")
          || sql.contains("GROUP BY cid, embedding")
          || sql.contains("SELECT DISTINCT source, text"),
        s"$n: replay must collapse on content before pairing")
    }
  }
}

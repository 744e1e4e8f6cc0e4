package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AutoComplete prefix top-K (reference `AutoComplete.scala:234-321`).
  *
  * `flat` ranks every (prefix, word) pair — simple, one shuffle, but the
  * exploded pair volume is Σ len(word) rows. `recursive` is the
  * reference's `ComputeTopRecursive` optimization re-expressed as an
  * iterative DataFrame loop from the longest prefix down: level L's
  * candidates are only level L+1's top-K survivors (plus words of length
  * exactly L), which is valid because a word in the top-K of prefix p is
  * necessarily in the top-K of its length-(L+1) child — shrinking every
  * shuffle above the base level from corpus-sized to ≤ k·|children|.
  */
object PrefixTopK {

  /** words: DataFrame(word, n). Returns (prefix, word, n, rank). */
  def flat(words: DataFrame, maxLen: Int, k: Int): DataFrame = {
    val prefixed = words
      .select(explode(transform(
        sequence(lit(1), least(length(col("word")), lit(maxLen))),
        i => col("word").substr(lit(1), i))).as("prefix"),
        col("word"), col("n"))
    KeyedOps.topKPerKey(prefixed, Seq(col("prefix")),
      Seq(col("n").desc, col("word").desc), k)
  }

  /** Same result set as `flat`, recursive-trie evaluation order. */
  def recursive(words: DataFrame, maxLen: Int, k: Int): DataFrame = {
    // base level: all words of length >= maxLen keyed by their maxLen prefix
    var survivors = KeyedOps.topKPerKey(
      words.filter(length(col("word")) >= maxLen)
        .select(substring(col("word"), 1, maxLen).as("prefix"),
          col("word"), col("n")),
      Seq(col("prefix")), Seq(col("n").desc, col("word").desc), k)
    var out = survivors.select(col("prefix"), col("word"), col("n"), col("rank"))
    var level = maxLen - 1
    while (level >= 1) {
      val cands = survivors
        .select(substring(col("prefix"), 1, level).as("prefix"),
          col("word"), col("n"))
        .unionAll(words.filter(length(col("word")) === level)
          .select(substring(col("word"), 1, level).as("prefix"),
            col("word"), col("n")))
      survivors = KeyedOps.topKPerKey(cands, Seq(col("prefix")),
        Seq(col("n").desc, col("word").desc), k)
      out = out.unionAll(
        survivors.select(col("prefix"), col("word"), col("n"), col("rank")))
      level -= 1
    }
    out
  }
}

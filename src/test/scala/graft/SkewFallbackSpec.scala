package graft

import graft.queries.TextAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The x14/x16 hot-key fallback, proven (round-10 verdict item 1): the
  * salted two-phase shape behind `spark.graft.saltedSkew` must be
  * result-IDENTICAL to the default window-count shape — on the driver
  * fixtures AND on a planted skew corpus where one context holds well
  * over 20% of all bigrams (the "the"-context straggler the default
  * shape cannot split at 100 TB).
  */
class SkewFallbackSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** 400 docs of alternating hot/cold tokens: every odd position is the
    * hot context token, so ~50% of bigram instances have w1 = "the" and
    * the other half end there (w2 = "the") — strictly harder than the
    * verdict's ≥20% bar. Cold tokens are Zipf-ish over a 500-word vocab
    * so the stats tables are non-trivial.
    */
  private def skewCorpus(): DataFrame = {
    import spark.implicits._
    spark.range(400).map { id =>
      val rng = new scala.util.Random(id * 2654435761L + 7)
      val n = 30 + rng.nextInt(11)
      val toks = (0 until n).map { i =>
        if (i % 2 == 1) "the"
        else s"w${(math.pow(rng.nextDouble(), 2.0) * 500).toInt}"
      }
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.mkString("|")).toSeq.sorted
  }

  test("skew fixture really is skewed: one context holds >= 20% of bigrams") {
    import spark.implicits._
    val bi = skewCorpus()
      .select($"doc_id", split($"text", " ").as("ts"))
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> ts[i - 1])")).as("w1"))
    val total = bi.count()
    val hot = bi.filter($"w1" === "the").count()
    assert(hot.toDouble / total >= 0.2,
      s"fixture drifted: hot context is only $hot/$total")
  }

  test("x14 salted two-phase shape is result-identical on the skew corpus") {
    val d = TextAnalytics.unigramLogprob(skewCorpus(), salted = false)
    val s = TextAnalytics.unigramLogprob(skewCorpus(), salted = true)
    assert(sortedRows(d) == sortedRows(s))
  }

  test("x16 salted two-phase shape is result-identical on the skew corpus") {
    val d = TextAnalytics.bigramLogprob(skewCorpus(), salted = false)
    val s = TextAnalytics.bigramLogprob(skewCorpus(), salted = true)
    assert(s.count() > 0)
    assert(sortedRows(d) == sortedRows(s))
  }

  test("x16 minDf tail prune: identity when off; pruned bigrams score as unseen") {
    import spark.implicits._
    // doc 1 carries (a,b)x2 + (b,a)x1; doc 2 carries (a,b)x1
    // -> corpus c12: (a,b)=3 (head), (b,a)=1 (tail at minDf=2)
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    def run(): Map[Long, (Long, Double)] =
      TextAnalytics.bigramLogprob(docs, salted = false)
        .as[(Long, Long, Double)].collect()
        .map { case (id, n, m) => id -> (n, m) }.toMap
    val exact = run()
    // identity when off: unset == explicit minDf=1 == the exact form
    spark.conf.set("graft.x16.minDf", "1")
    try assert(run() == exact, "minDf=1 must be the exact form")
    finally spark.conf.unset("graft.x16.minDf")
    assert(run() == exact, "unset must be the exact form")
    spark.conf.set("graft.x16.minDf", "2")
    try {
      val pruned = run()
      // doc 2 only uses the head bigram (a,b): row unchanged
      assert(pruned(2L) == exact(2L),
        "head-only doc must be untouched by the tail prune")
      // doc 1's (b,a) now scores as unseen (c12=0 < 1): strictly lower
      assert(pruned(1L)._1 == exact(1L)._1, "bigram counts must not change")
      assert(pruned(1L)._2 < exact(1L)._2,
        s"tail bigram must score lower when pruned: ${pruned(1L)} vs ${exact(1L)}")
    } finally spark.conf.unset("graft.x16.minDf")
  }

  test("x16 minDf head past the broadcast ceiling: fallback join is result-identical") {
    // Round 19 (r18 ADVICE medium): the forced broadcast(head) hint is
    // size-gated — past graft.x16.broadcastMaxRows the pruned path
    // falls back to the salted / size-selected (w1,w2) LEFT join
    // instead of bypassing autoBroadcastJoinThreshold with a
    // near-full-vocab head. Ceiling 0 forces the fallback on any
    // corpus; results must be identical on both the plain and salted
    // shapes, including on the skew corpus the salting exists for.
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, salted: Boolean) =
      sortedRows(TextAnalytics.bigramLogprob(d, salted = salted))
    spark.conf.set("graft.x16.minDf", "2")
    try {
      val viaBroadcast = run(docs, salted = false)
      val viaBroadcastSkew = run(skewCorpus(), salted = true)
      spark.conf.set("graft.x16.broadcastMaxRows", "0")
      try {
        assert(run(docs, salted = false) == viaBroadcast,
          "plain fallback must match the broadcast path")
        assert(run(docs, salted = true) == viaBroadcast,
          "salted LEFT fallback must match the broadcast path")
        assert(run(skewCorpus(), salted = true) == viaBroadcastSkew,
          "salted fallback must match on the skew corpus")
      } finally spark.conf.unset("graft.x16.broadcastMaxRows")
    } finally spark.conf.unset("graft.x16.minDf")
  }

  test("x29 salted interpolated-LM shape is result-identical on the skew corpus") {
    val d = TextAnalytics.interpLm(skewCorpus(), salted = false)
    val s = TextAnalytics.interpLm(skewCorpus(), salted = true)
    assert(s.count() > 0)
    assert(sortedRows(d) == sortedRows(s))
  }

  /** Boilerplate-heavy corpus for the d12 shingle-df fallback: every doc
    * starts with the same 12-token boilerplate banner, so the banner's
    * 8-gram shingles carry df = n_docs — the hot fingerprint class the
    * round-10 ADVICE flagged for the repartition+window-count pattern.
    */
  private def boilerplateCorpus(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val banner = "all rights reserved terms of use privacy policy cookie notice applies"
    spark.range(300).map { id =>
      val rng = new scala.util.Random(id * 40503L + 3)
      val body = (0 until 25).map(_ => s"w${rng.nextInt(400)}").mkString(" ")
      (id, s"$banner $body")
    }.toDF("doc_id", "text")
  }

  test("d12 salted shingle-df shape is result-identical on a boilerplate corpus") {
    val d = graft.queries.Dedup.ngramNovelty(boilerplateCorpus(), 8,
      salted = false)
    val s = graft.queries.Dedup.ngramNovelty(boilerplateCorpus(), 8,
      salted = true)
    assert(s.count() > 0)
    assert(sortedRows(d) == sortedRows(s))
  }

  test("x14/x16 salted shape matches the default on the driver fixture") {
    val docs = graft.core.Tables.documents(spark, dir)
    assert(sortedRows(TextAnalytics.unigramLogprob(docs, salted = false)) ==
      sortedRows(TextAnalytics.unigramLogprob(docs, salted = true)))
    assert(sortedRows(TextAnalytics.bigramLogprob(docs, salted = false)) ==
      sortedRows(TextAnalytics.bigramLogprob(docs, salted = true)))
  }

  test("j11 term-parallel clustering (bm25.termParallel) is result-identical") {
    // the (qid, w) clustering trades two more posting-sized exchanges
    // for parallelism ∝ query terms — scores must not move at all.
    // Exercised on the UNPINNED plan (bm25Plan): the queries-map entry
    // now returns the session-pinned frame, which would hide the flag.
    val base = sortedRows(TextAnalytics.bm25Plan(spark, dir))
    try {
      spark.conf.set("spark.graft.bm25.termParallel", "true")
      assert(sortedRows(TextAnalytics.bm25Plan(spark, dir)) == base)
    } finally spark.conf.unset("spark.graft.bm25.termParallel")
  }

  test("j11/j12 share ONE pinned bm25 rank frame per (session, dir)") {
    val a = SparkEntry.queries("j11_bm25")(spark, dir)
    val b = SparkEntry.queries("j11_bm25")(spark, dir)
    assert(a eq b, "second j11 build must return the pinned frame")
    // and the pinned frame's values equal a fresh unpinned evaluation
    assert(sortedRows(a) == sortedRows(TextAnalytics.bm25Plan(spark, dir)))
  }

  /** Degenerate-repetition corpus for the d12 AUTO trigger: 300 docs of
    * one repeated token — every 8-gram shingle of such a doc is the SAME
    * hashed shingle, so that one key holds ~75% of all shingle
    * instances (the boilerplate-straggler shape at its worst), plus 100
    * normal docs so the novelty math is non-trivial.
    */
  private def repeatedTokenCorpus(): DataFrame = {
    import spark.implicits._
    spark.range(400).map { id =>
      if (id < 300) (id, Seq.fill(30)("the").mkString(" "))
      else {
        val rng = new scala.util.Random(id * 7919L + 11)
        (id, (0 until 30).map(_ => s"w${rng.nextInt(400)}").mkString(" "))
      }
    }.toDF("doc_id", "text")
  }

  // ---- round-13: x34's measured trigger wired to plan selection ----
  // No conf flag is set in any of these tests: the tri-state default
  // ("auto") probes the corpus and must pick the right shape by itself.

  test("AUTO: skewed corpus plans the salted x14/x16 shape WITHOUT the flag") {
    assert(spark.conf.getOption(TextAnalytics.SaltedSkewKey).isEmpty)
    for (df <- Seq(TextAnalytics.unigramLogprob(skewCorpus()),
                   TextAnalytics.bigramLogprob(skewCorpus()),
                   TextAnalytics.interpLm(skewCorpus()))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"auto must salt on the skew corpus:\n$p")
      assert(p.contains("xxhash64"), s"auto must salt on the skew corpus:\n$p")
    }
  }

  test("AUTO: repeated-token corpus plans the salted d12 shape WITHOUT the flag") {
    assert(spark.conf.getOption(TextAnalytics.SaltedSkewKey).isEmpty)
    val p = graft.queries.Dedup.ngramNovelty(repeatedTokenCorpus(), 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"auto must salt on the repeated corpus:\n$p")
    assert(p.contains("xxhash64"), s"auto must salt on the repeated corpus:\n$p")
  }

  test("AUTO: the flat driver fixture keeps the default (unsalted) shape") {
    assert(spark.conf.getOption(TextAnalytics.SaltedSkewKey).isEmpty)
    val docs = graft.core.Tables.documents(spark, dir)
    // round 14: the LM default is the pin-fed agg+join (no Window in
    // EITHER shape anymore) — "default" now means the stats join keys
    // on the bare term, with no explicit salt
    for (df <- Seq(TextAnalytics.unigramLogprob(docs),
                   TextAnalytics.bigramLogprob(docs))) {
      val p = graft.core.PlanWalk.outer(df)
      assert(!p.contains("__salt"),
        s"auto must NOT salt a flat corpus (top share ~3.4%):\n$p")
    }
    // d12 keeps its window-count default
    val p12 = graft.queries.Dedup.ngramNovelty(docs, 8)
      .queryExecution.executedPlan.toString
    assert(p12.contains("Window"),
      s"auto must NOT salt d12 on a flat corpus:\n$p12")
  }

  test("AUTO: result identity on the skew corpus via the auto path") {
    // the auto plan's values must equal the forced-default plan's
    val auto = sortedRows(TextAnalytics.unigramLogprob(skewCorpus()))
    val dflt = sortedRows(TextAnalytics.unigramLogprob(skewCorpus(),
      salted = false))
    assert(auto == dflt)
  }

  test("queries-map dispatch: the conf flag selects the salted plan") {
    try {
      spark.conf.set(TextAnalytics.SaltedSkewKey, "true")
      for (q <- Seq("x14_unigram_logprob", "x16_bigram_logprob")) {
        val p = SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.toString
        assert(!p.contains("Window"),
          s"$q salted plan must carry no window count:\n$p")
        assert(p.contains("xxhash64"),
          s"$q salted plan must salt on the doc hash:\n$p")
      }
    } finally spark.conf.unset(TextAnalytics.SaltedSkewKey)
  }
}

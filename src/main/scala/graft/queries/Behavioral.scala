package graft.queries

import graft.core.Tables
import graft.functions.HashFunctions
import graft.operators.KeyedOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Gaming/traffic-shaped operators over the `events` stream table — the
  * remaining batch rows of SURVEY §2 (P3/P8/P11/P15-P17, A3/A4/A6/A9/A10/
  * A11/A12/A14/A16, T3). Streaming counterparts live in `graft.streaming`;
  * these batch forms share the identical column expressions.
  */
object Behavioral extends QueryModule {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(s"decimal(22,$scale)")).cast("double")

  override def queries: Map[String, Q] = Map(
    // P3+A3: KV projection + per-key integer sum (reference UserScore,
    // `UserScore.scala:171-175`). One shuffle, map-side combined.
    "a3_sum_per_key" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select($"user_id", $"value")
        .groupBy($"user_id")
        .agg(dsum($"value").as("total_value"))
    },

    // A4: global sum (reference `Sum.longsGlobally`, `AutoComplete.scala:135-137`).
    "a4_sum_global" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).agg(dsum($"value").as("total"))
    },

    // A6: global mean (reference `Mean.globally`, `GameStats.scala:166`).
    "a6_mean_global" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .agg((dsum($"value") / count(lit(1))).as("mean_value"))
    },

    // A9: collapse group to constant — session existence marker
    // (reference `Combine.perKey(_ => 0)`, `GameStats.scala:155-157`).
    // Gaps-and-islands shape (round 13): `session_window`'s batch agg
    // plans the non-codegen UpdatingSessions/MergingSessions pair, which
    // stayed at ~1.2 s even after the r12 column-projection fix. The
    // break-marker + running-sum form is the SAME math the oracle runs
    // (new session iff ts >= prev + gap, proven hash-identical), rides
    // ONE user_id exchange + one sort through two codegen-friendly
    // window passes, and the final (user_id, g) agg reuses the user_id
    // partitioning (a subset of the group keys — no second exchange).
    // w3_session / the streaming surface keep the real session_window.
    "a9_session_marker" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byTs = Window.partitionBy($"user_id").orderBy($"ts")
      val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select($"ts", $"user_id")
        .withColumn("prev", lag($"ts", 1).over(byTs))
        .withColumn("brk", when($"prev".isNull ||
          $"ts" >= $"prev" + expr("INTERVAL 10 MINUTES"), 1L).otherwise(0L))
        .withColumn("g", sum($"brk").over(run))
        .groupBy($"user_id", $"g")
        .agg(min($"ts").as("s_start"))
        .select($"user_id", $"s_start", lit(0).cast("int").as("marker"))
    },

    // A10: full per-key grouping with downstream iteration (reference
    // `GroupByKey` + ParDo, `TriggerExample.scala:313-336`) — sorted
    // event-id list per user, deterministic under shuffle order.
    "a10_group_collect" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(array_join(array_sort(collect_list($"event_id".cast("string"))), ",")
          .as("event_ids"))
    },

    // A11: per-key ordered fold (reference TrafficRoutes slowdown
    // detection, `TrafficRoutes.scala:207-250`): order a user's events by
    // time, compare each value to the first-seen value for its event_type,
    // count drops/rises, flag slowdown iff drops >= 2*rises.
    // Round-13 shape (r11 verdict item 5): the fold is order-dependent
    // only through "first value per (user, event_type)" — which is
    // first_value over a (user_id, event_type)-partitioned window, fully
    // codegen'd — so the typed `OrderedFold.foldSortedGroups` form (1.45 s
    // at sf0.1: per-row encoder deserialization) is replaced by ONE
    // window pass + one hash agg (same sort, no encoders). The typed
    // operator itself stays in `operators/OrderedFold` (ReferencePipelines
    // consumes it; OperatorsSpec covers it) for folds whose state
    // genuinely cannot be expressed as window functions.
    "a11_ordered_fold" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy($"user_id", $"event_type")
        .orderBy($"ts_us", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          $"event_type", $"value")
        .withColumn("first_v", first($"value").over(w))
        .withColumn("rn", row_number().over(w))
        .groupBy($"user_id")
        .agg(
          sum(when($"rn" > 1 && $"value" < $"first_v", 1L).otherwise(0L))
            .as("n_drops"),
          sum(when($"rn" > 1 && $"value" > $"first_v", 1L).otherwise(0L))
            .as("n_rises"))
        .select($"user_id", $"n_drops", $"n_rises",
          ($"n_drops" >= $"n_rises" * 2).as("slowdown"))
    },

    // A12: post-group sum + count (reference `TriggerExample.scala:327-336`).
    "a12_sum_count" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(dsum($"value").as("total"), count(lit(1)).as("n"))
    },

    // A14: keys projection (reference `Keys.create`, `TfIdf.scala:197`).
    "a14_keys" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).select($"user_id").distinct()
    },

    // A16: observability metrics (reference `Metrics.counter`,
    // `WordCount.scala:73-76`) — df.observe side-channel; the observed
    // values are also the query result so the oracle checks them.
    "a16_metrics" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .observe("a16", count(lit(1)).as("n_events"),
          sum(when($"value" < 0, 1).otherwise(0)).as("n_negative"))
        .agg(count(lit(1)).as("n_events"),
          sum(when($"value" < 0, 1).otherwise(0)).cast("bigint").as("n_negative"))
    },

    // P8: regex find-all + explode (reference hashtag extractor,
    // `AutoComplete.scala:352-360`) — integer tokens mined from props.
    "p8_extract_explode" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select(explode(expr("regexp_extract_all(props, '(\\\\d+)', 1)"))
          .as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
    },

    // P11: multi-branch fan-out over one input (reference 4-variant
    // trigger demo, `TriggerExample.scala:78-99`): one cached scan, four
    // derived aggregates, unioned with a branch tag.
    "p11_multibranch" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir).select($"event_type", $"value")
      val branches = Seq(
        ("all", ev),
        ("positive", ev.filter($"value" > 0)),
        ("large", ev.filter($"value" > 100)),
        ("clicks", ev.filter($"event_type" === "click")))
      branches.map { case (tag, df) =>
        df.groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .select(lit(tag).as("branch"), $"event_type", $"n")
      }.reduce(_ unionAll _)
    },

    // P15: tiny hardwired lookup map joined broadcast-style (reference
    // station→route map, `TrafficRoutes.scala:182-199,310-316`).
    "p15_lookup_join" -> { (s, dir) =>
      import s.implicits._
      val lookup = s.createDataFrame(Seq(
        ("click", "interactive"), ("view", "passive"),
        ("purchase", "commerce"), ("login", "auth"))).toDF("event_type", "category")
      Tables.events(s, dir)
        .join(broadcast(lookup), Seq("event_type"), "left_outer")
        .groupBy(coalesce($"category", lit("other")).as("category"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
    },

    // P16: validity filtering (reference flow-record checks,
    // `TriggerExample.scala:367-386`): structural + range predicates.
    "p16_validity_filter" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .filter($"value" > 0 && $"user_id".isNotNull &&
          length($"event_type") > 0 && $"event_type" =!= "header")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_valid"))
    },

    // P17: deterministic late-data injection (reference random-delay DoFn,
    // `TriggerExample.scala:388-410`, made reproducible via the portable
    // hash): ~1/600 of events delayed by 5 minutes.
    // J7: left AS-OF join — for every click, the user's latest purchase
    // at or before it (classic attribution). Spark has no native as-of
    // join; `operators/AsOfJoin` composes it from a union + ONE window
    // pass per key (the merge-scan shape a native implementation runs).
    // The right side is pre-aggregated to one row per (user, ts) so the
    // match is well-defined; oracle = DuckDB's native ASOF LEFT JOIN.
    "j7_asof_attribution" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max($"value").as("purchase_value"))
      graft.operators.AsOfJoin.leftAsOf(
          clicks, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
        .select($"user_id", $"event_id".as("click_id"),
          $"ts".as("click_ts"), $"asof_ts".as("purchase_ts"),
          $"asof_purchase_value".as("purchase_value"))
    },

    "p17_late_inject" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("is_late", HashFunctions.knuthHash($"event_id") % 600 === 0)
        .withColumn("adj_ts",
          when($"is_late", $"ts" - expr("INTERVAL 5 MINUTES")).otherwise($"ts"))
        .groupBy(window($"adj_ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum($"is_late".cast("long")).as("n_late"))
        .select($"w.start".as("w_start"), $"n", $"n_late")
    },

    // J6/W16 window-aligned map side input, oracle-checked batch form
    // (reference GameStats spam filter, `GameStats.scala:102-130,184-192`,
    // documented anti-join semantics): per hourly window, users above
    // 2.5x the window's mean user-total are excluded from per-type totals.
    "j6w_windowed_anti" -> { (s, dir) =>
      import s.implicits._
      // Round-13 shape (r11 verdict item 4): the per-window mean moves
      // from an analytic window over the user-totals frame to an
      // agg+join — the d32/d33 fix applied here: a w-partitioned window
      // buffers EVERY user total of an hour in one partition (users ∝
      // corpus: the straggler at 100 TB), where the hours-sized mean
      // aggregate joins back AQE-splittably. Exchanges: the (w, user)
      // agg plans its own corpus exchange with map-side combine (≤1 row
      // per (w, user) per map partition), the mean agg and its join are
      // hours-bounded, the spammer anti-join broadcasts. An A/B against
      // a one-corpus-pass (w, user, event_type) partial pre-aggregate
      // measured the pre-agg SLOWER at fixture SF (it adds two more
      // stage barriers and the partials barely reduce — ~126k groups on
      // 100k events) and equal-shuffle at scale, so the two-scan shape
      // stays; SCALE.md carries the stage-floor breakdown.
      //
      // Round 15 (verdict item 3): ONE corpus exchange, not two. The
      // mean is derived from the ut frame, but the two planned copies of
      // ut's subtree used to canonicalize DIFFERENTLY — the anti-join
      // infers IsNotNull(user_id) on its build side and pushes it into
      // the spammers copy's scan only — so ReuseExchange could never
      // dedupe them and the (w, user) corpus agg ran twice. Filtering
      // null users explicitly at ut's source (the spam contract is
      // per-USER; a null key is not a user — oracle SQL carries the same
      // predicate) makes both subtrees canonically identical, and AQE
      // stage reuse collapses them: one scan + one (w, user) exchange
      // feeding both the mean re-agg and the spammer join.
      //
      // CONTRACT NOTE (r15 ADVICE): the null-user filter is a RESULT-
      // CHANGING semantics clarification, not a pure perf fix — on data
      // carrying null user_ids those rows previously contributed to the
      // per-window mean's sum and denominator, so spammer classification
      // (and hence output totals) can differ. Engine and oracle changed
      // in lockstep; the documented contract is now "spam is a per-user
      // property; null-keyed rows are never spam inputs".
      val ev = Tables.events(s, dir)
        .withColumn("w", window($"ts", "1 hour"))
      val ut = ev
        .filter($"user_id".isNotNull)
        .groupBy($"w", $"user_id")
        .agg(dsum($"value").as("user_total"))
      val mt = ut.groupBy($"w")
        .agg((sum($"user_total".cast("decimal(22,6)")).cast("double") /
          count(lit(1))).as("mean_total"))
      val spammers = ut.join(mt, Seq("w"))
        .filter($"user_total" > $"mean_total" * 2.5)
        .select($"w", $"user_id")
      ev.join(spammers, Seq("w", "user_id"), "left_anti")
        .groupBy($"w.start".as("w_start"), $"event_type")
        .agg(dsum($"value").as("type_total"), count(lit(1)).as("n"))
    },

    // W2+A7 composite (the TrafficMaxLaneFlow shape end-to-end,
    // `TrafficMaxLaneFlow.scala:99-103,245-308`): arg-max reading per
    // (sliding window, event_type). Explodes each event into its 4
    // windows BEFORE one hash agg — no window-function sort.
    "q7_traffic_argmax" -> { (s, dir) =>
      import s.implicits._
      KeyedOps.argMaxPerKey(
        Tables.events(s, dir)
          .withColumn("w", window($"ts", "1 hour", "15 minutes")),
        keys = Seq($"w.start".as("w_start"), $"event_type"),
        ord = Seq($"value".as("__v"), $"event_id".as("__id")),
        payload = Seq("value" -> $"value", "event_id" -> $"event_id"))
        .select($"w_start", $"event_type", $"value", $"event_id")
    },

    // A17: per-type VARIANCE + 3σ outlier counts — the second moment the
    // aggregate surface (count/sum/max/mean) lacked, and the rule-based
    // anomaly flagging monitoring pipelines run per event class.
    // Population variance from exact decimal Σx/Σx² (values carry ≤ 2dp
    // so x² ≤ 4dp: the decimal(22,6) casts are exact, no cross-engine
    // rounding divergence), converted to double once — (sx2 − sx²/n)/n
    // evaluates in the same IEEE order in both engines, so the 3σ
    // comparison per row is bit-stable. Two pruned (event_type, value)
    // scans and NOTHING else (round 13): the ≤|event_type|-row stats
    // frame is dimension-bounded, so it is COLLECTED (the j5
    // singleton-side-input doctrine) and re-enters the flagging pass as
    // a literal CASE chain — no broadcast exchange, no joins, two plain
    // map-side-combined aggregations. The literals keep the stats'
    // DECIMAL types so the per-row decimal→double promotion in the 3σ
    // compare is bit-identical to the joined form. At 100 TB both
    // passes are single shuffles on event_type; the collect stays
    // O(|event_type|).
    "a17_variance_outliers" -> { (s, dir) =>
      import s.implicits._
      // event_type.isNotNull preserves the pre-r13 output contract
      // (round-13 ADVICE): the old inner join with the stats frame
      // dropped null-keyed rows; the literal CASE chain never matches a
      // null key, so an unfiltered groupBy would emit a spurious
      // (null, null, null, null, 0) row the join form never produced
      val ev = Tables.events(s, dir).select($"event_type", $"value")
        .filter($"event_type".isNotNull)
      val statsDf = ev
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          dsum($"value").as("sx"),
          dsum($"value" * $"value").as("sx2"))
        .select($"event_type", $"n", ($"sx" / $"n").as("mean"),
          (($"sx2" - $"sx" * $"sx" / $"n") / $"n").as("variance"))
      val meanT = statsDf.schema("mean").dataType
      val varT = statsDf.schema("variance").dataType
      val stats = statsDf.collect() // ≤|event_type| rows: dimension-bounded
      def chain(value: org.apache.spark.sql.Row => Any,
          t: org.apache.spark.sql.types.DataType)
          : org.apache.spark.sql.Column =
        stats.foldLeft(lit(null).cast(t)) { (acc, r) =>
          when($"event_type" === lit(r.getString(0)),
            lit(value(r)).cast(t)).otherwise(acc)
        }
      val meanCol = chain(_.get(2), meanT)
      val varCol = chain(_.get(3), varT)
      val nCol = chain(_.getLong(1), org.apache.spark.sql.types.LongType)
      ev.groupBy($"event_type")
        .agg(sum(when(abs($"value" - meanCol) > lit(3.0) * sqrt(varCol),
          1L).otherwise(0L)).as("n_outliers"))
        .select($"event_type", nCol.as("n"), round(meanCol, 6).as("mean"),
          round(varCol, 6).as("variance"), $"n_outliers")
    },

    // A18: per-user TRAILING-HOUR window stats — the time-RANGE frame
    // (`RANGE BETWEEN 1h PRECEDING AND CURRENT ROW`) the window surface
    // lacked: rows/prefix frames (x12/p22/a11) count rows, this one
    // bounds the frame by the ORDERING VALUE, the shape of rate
    // limiting, trailing-activity features, and rolling QoS stats.
    // Partitioned on user_id — high-cardinality, so partitions stay
    // bounded at 100 TB (the same frame keyed on the 5-value event_type
    // would serialize each type through one task: the known low-
    // cardinality range-window trap — shard first if you need that).
    // Ties on ts_us are frame PEERS in both engines (all included), so
    // the result is order-insensitive. Mean = decimal window sum cast
    // double / count, round 6 (a17's parity convention).
    "a18_trailing_hour" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, dir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"value".cast("decimal(22,6)").as("v"))
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          round(sum($"v").over(w).cast("double") / count(lit(1)).over(w), 6)
            .as("mean_1h"))
    },

    // A19: ROLLUP aggregation — the multi-level grouping-sets surface
    // (per (lang, source), per lang, grand total in ONE aggregate):
    // the cube/rollup machinery reporting layers run instead of three
    // separate groupBys + union. Catalyst expands the rollup to
    // grouping sets inside a single Expand + hash aggregate with
    // map-side combine — one shuffle carrying ≤3× the group cardinality
    // (bounded by lang×source, not the corpus). gid is the standard
    // grouping bit-vector (lang = MSB), identical in both engines.
    "a19_rollup_stats" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .rollup($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
          grouping_id().as("gid"))
    },

    // J10: FUNNEL sessionization — per user, the earliest chain
    // view → click → purchase with each stage's timestamp constrained
    // to follow the previous stage (the conversion analysis every
    // event-analytics deployment runs). Three stage frames, each ONE
    // filtered min-agg keyed on user_id joined to the previous stage —
    // shuffles are (user, ts) pairs with map-side combine, never the
    // event log; the stage joins are user-keyed equi-joins. Earliest-
    // first greedy per stage is the standard funnel semantics (each
    // stage minimizes its own time given the previous stage). Times as
    // epoch micros (unix_micros ↔ epoch_us parity, cf. the dup-reading
    // detector below); non-converting users carry NULLs forward.
    "j10_funnel" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("t_view"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id").filter($"ts_us" >= $"t_view")
        .groupBy($"user_id").agg(min($"ts_us").as("t_click"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id").filter($"ts_us" >= $"t_click")
        .groupBy($"user_id").agg(min($"ts_us").as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id", $"t_view", $"t_click", $"t_purchase")
    },

    // P21: semi-structured JSON extraction — the props payload parsed
    // with the engine's JSON path accessor (get_json_object), typed, and
    // aggregated per event type. Pure rowwise parse inside codegen + one
    // small-keyed hash agg; at 100 TB the parse cost is the scan and
    // the shuffle carries 5 keys. Integer sums stay exact (no decimal
    // dance needed).
    "p21_json_props" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
    },

    // P22: SESSIONIZATION — assign each event its per-user session index
    // (30-minute inactivity gap rule). Where W3's session_window
    // AGGREGATES per session, this emits the per-event session-id
    // column downstream joins key on (the labeling transform itself —
    // episode construction for behavioral training data). One window
    // pass partitioned on user_id: lag(ts) flags session starts, a
    // running sum turns flags into indices. Per-user partitions keep the
    // sort data-parallel at any scale (no global window); ties break on
    // event_id in both engines.
    "p22_sessionize" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val gapMs = 30L * 60 * 1000000 // 30 min in micros
      Tables.events(s, dir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
        .withColumn("new_sess",
          when(lag($"ts_us", 1).over(w).isNull ||
            $"ts_us" - lag($"ts_us", 1).over(w) > gapMs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select($"event_id", $"user_id", $"ts_us", $"session_id")
    },

    // T3: AutoComplete prefix top-K (flat form; recursive-trie variant in
    // `graft.operators.PrefixTopK` is plan-identical in results —
    // reference `AutoComplete.scala:257-321`). Word counts → explode
    // prefixes (len 1-4) → top-3 words per prefix.
    "t3_prefix_topk" -> { (s, dir) =>
      import s.implicits._
      val counts = Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokenize($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
      val prefixed = counts
        .select(explode(transform(
          sequence(lit(1), least(length($"word"), lit(4))),
          i => $"word".substr(lit(1), i))).as("prefix"),
          $"word", $"n")
      KeyedOps.topKPerKey(prefixed, Seq($"prefix"),
          Seq($"n".desc, $"word".desc), 3)
        .select($"prefix", $"word", $"n", $"rank")
    },

    // P23: RETENTION COHORTS — the classic behavioral-analytics rollup
    // p22's sessions feed: users cohorted by first-active day, the
    // (cohort, day-offset) activity matrix, and the retention rate vs
    // cohort size. Plan: user-day activity is ONE distinct exchange,
    // first-seen ONE user-keyed agg, the cohort attachment a linear
    // user_id equi-join (AQE-splittable, never keyed on a hot
    // dimension), and both rollups are bounded (≤ days² cells,
    // ≤ days cohort sizes — the size join-back broadcasts). No
    // windows, no skew-prone keys; at 100 TB every exchange carries
    // (user, day)-grain rows, not events. Parity: day = floor(µs /
    // 86.4e9) — numerator and denominator are both exact doubles
    // (< 2^53) so the floored quotient is engine-identical; counts
    // integer-exact; retention one IEEE division of exact integers,
    // round-6.
    "p23_retention_cohorts" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id",
          floor(unix_micros($"ts") / lit(86400000000L)).cast("long")
            .as("day"))
        .distinct()
      val first = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      val sizes = first.groupBy($"cohort_day")
        .agg(count(lit(1)).as("cohort_size"))
      ev.join(first, Seq("user_id"))
        .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, Seq("cohort_day"))
        .select($"cohort_day", $"day_offset", $"n_active", $"cohort_size",
          round($"n_active".cast("double") / $"cohort_size".cast("double"), 6)
            .as("retention"))
    },
  )

  override def oracle: Map[String, String] = Map(
    "a17_variance_outliers" ->
      """WITH stats AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value * value AS DECIMAL(22,6))) AS DOUBLE) AS sx2
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT event_type, n, sx / n AS mean,
        |    (sx2 - sx * sx / n) / n AS variance
        |  FROM stats)
        |SELECT e.event_type, min(n)::BIGINT AS n,
        |  round(min(mean), 6) AS mean,
        |  round(min(variance), 6) AS variance,
        |  sum(CASE WHEN abs(value - mean) > 3.0 * sqrt(variance)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM events e JOIN m USING (event_type)
        |GROUP BY 1""".stripMargin,

    "a18_trailing_hour" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(CAST(sum(CAST(value AS DECIMAL(22,6))) OVER w AS DOUBLE)
        |    / (count(*) OVER w), 6) AS mean_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "a19_rollup_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  (2 * GROUPING(lang) + GROUPING(source))::BIGINT AS gid
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

    "j10_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (
        |  SELECT user_id, min(ts_us) AS t_view FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT ev.user_id, min(ts_us) AS t_click
        |  FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE event_type = 'click' AND ts_us >= t_view GROUP BY 1),
        |p AS (
        |  SELECT ev.user_id, min(ts_us) AS t_purchase
        |  FROM ev JOIN c ON ev.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND ts_us >= t_click GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,

    "p22_sessionize" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |flagged AS (
        |  SELECT event_id, user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT event_id, user_id, ts_us,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |FROM flagged""".stripMargin,

    "p21_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "a3_sum_per_key" ->
      """SELECT user_id,
        |  CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,

    "a4_sum_global" ->
      "SELECT CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total FROM events",

    "a6_mean_global" ->
      """SELECT CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) / count(*)
        |  AS mean_value FROM events""".stripMargin,

    "a9_session_marker" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grp AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS g
        |  FROM marked)
        |SELECT user_id, min(ts) AS s_start, 0::INTEGER AS marker
        |FROM grp GROUP BY user_id, g""".stripMargin,

    "a10_group_collect" ->
      """SELECT user_id,
        |  string_agg(event_id::VARCHAR, ',' ORDER BY event_id::VARCHAR)
        |    AS event_ids
        |FROM events GROUP BY user_id""".stripMargin,

    "a11_ordered_fold" ->
      """WITH seq AS (
        |  SELECT user_id, event_type, value,
        |    first_value(value) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS first_v,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN rn > 1 AND value < first_v THEN 1 ELSE 0 END) AS BIGINT) AS n_drops,
        |  CAST(sum(CASE WHEN rn > 1 AND value > first_v THEN 1 ELSE 0 END) AS BIGINT) AS n_rises,
        |  sum(CASE WHEN rn > 1 AND value < first_v THEN 1 ELSE 0 END)
        |    >= 2 * sum(CASE WHEN rn > 1 AND value > first_v THEN 1 ELSE 0 END) AS slowdown
        |FROM seq GROUP BY user_id""".stripMargin,

    "a12_sum_count" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "a14_keys" -> "SELECT DISTINCT user_id FROM events",

    "a16_metrics" ->
      """SELECT count(*) AS n_events,
        |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
        |FROM events""".stripMargin,

    "p8_extract_explode" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_extract_all(props, '(\d+)', 1)) AS token
        |      FROM events)
        |GROUP BY token""".stripMargin,

    "p11_multibranch" ->
      """SELECT 'all' AS branch, event_type, count(*) AS n FROM events GROUP BY 2
        |UNION ALL
        |SELECT 'positive', event_type, count(*) FROM events WHERE value > 0 GROUP BY 2
        |UNION ALL
        |SELECT 'large', event_type, count(*) FROM events WHERE value > 100 GROUP BY 2
        |UNION ALL
        |SELECT 'clicks', event_type, count(*) FROM events WHERE event_type = 'click' GROUP BY 2""".stripMargin,

    "p15_lookup_join" ->
      """WITH lookup(event_type, category) AS (VALUES
        |  ('click', 'interactive'), ('view', 'passive'),
        |  ('purchase', 'commerce'), ('login', 'auth'))
        |SELECT coalesce(category, 'other') AS category, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
        |FROM events LEFT OUTER JOIN lookup USING (event_type)
        |GROUP BY 1""".stripMargin,

    "p16_validity_filter" ->
      """SELECT event_type, count(*) AS n_valid FROM events
        |WHERE value > 0 AND user_id IS NOT NULL
        |  AND len(event_type) > 0 AND event_type <> 'header'
        |GROUP BY event_type""".stripMargin,

    "j7_asof_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
        |  p.ts AS purchase_ts, p.purchase_value
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "p17_late_inject" ->
      s"""WITH adj AS (
         |  SELECT *,
         |    ${OracleFragments.knuthU32("event_id")} % 600 = 0 AS is_late,
         |    CASE WHEN ${OracleFragments.knuthU32("event_id")} % 600 = 0
         |         THEN ts - INTERVAL 5 MINUTE ELSE ts END AS adj_ts
         |  FROM events)
        |SELECT date_trunc('hour', adj_ts) AS w_start, count(*) AS n,
        |  CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |FROM adj GROUP BY 1""".stripMargin,

    "j6w_windowed_anti" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS w, user_id, event_type, value
        |  FROM events),
        |ut AS (
        |  SELECT w, user_id,
        |    CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS user_total
        |  FROM ev WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |mt AS (
        |  SELECT w,
        |    CAST(sum(CAST(user_total AS DECIMAL(22,6))) AS DOUBLE) / count(*)
        |      AS mean_total
        |  FROM ut GROUP BY 1),
        |spam AS (
        |  SELECT ut.w, ut.user_id FROM ut JOIN mt ON ut.w = mt.w
        |  WHERE user_total > mean_total * 2.5)
        |SELECT ev.w AS w_start, event_type,
        |  CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS type_total,
        |  count(*) AS n
        |FROM ev ANTI JOIN spam ON ev.w = spam.w AND ev.user_id = spam.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q7_traffic_argmax" ->
      """WITH slid AS (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - i * INTERVAL 15 MINUTE
        |      AS w_start,
        |    event_type, value, event_id
        |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS i))
        |SELECT w_start, event_type, value, event_id
        |FROM (SELECT *, row_number() OVER (PARTITION BY w_start, event_type
        |        ORDER BY value DESC, event_id DESC) AS rn
        |      FROM slid)
        |WHERE rn = 1""".stripMargin,

    "t3_prefix_topk" -> {
      val tok = OracleFragments.tokenize("text")
      s"""WITH counts AS (
         |  SELECT word, count(*) AS n
         |  FROM (SELECT unnest($tok) AS word FROM documents) GROUP BY word),
         |prefixed AS (
         |  SELECT substring(word, 1, i) AS prefix, word, n
         |  FROM counts
         |  CROSS JOIN (SELECT unnest([1,2,3,4]) AS i)
         |  WHERE i <= len(word))
         |SELECT prefix, word, n, CAST(rank AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY prefix
         |        ORDER BY n DESC, word DESC) AS rank FROM prefixed)
         |WHERE rank <= 3""".stripMargin
    },

    "p23_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        |sz AS (
        |  SELECT cohort_day, count(*)::BIGINT AS cohort_size
        |  FROM f GROUP BY 1),
        |act AS (
        |  SELECT f.cohort_day, ev.day - f.cohort_day AS day_offset,
        |    count(*)::BIGINT AS n_active
        |  FROM ev JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT act.cohort_day, day_offset, n_active, cohort_size,
        |  round(n_active::DOUBLE / cohort_size::DOUBLE, 6) AS retention
        |FROM act JOIN sz USING (cohort_day)""".stripMargin,
  )
}

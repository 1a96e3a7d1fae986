package graft

import org.apache.spark.sql.execution.FormattedMode

/** Pins the physical-plan properties PLANS.md documents — a regression here
  * means a scale property silently degraded even if results stay correct.
  */
class PlanSpec extends GraftSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  /** count DATA-DEPENDENT shuffle exchanges via the detail headers
    * "(n) Exchange" (each operator appears twice in formatted mode —
    * tree + detail), excluding the bounded RoundRobin input fan-outs
    * Tables.cpuFanOut inserts when the artifact under-splits (single-
    * row-group documents/embeddings). The fan-out is self-disabling on
    * properly-split inputs, so the design claims these pins protect
    * ("zero-shuffle", "one exchange") are about shuffles the OPERATOR
    * requires — keyed repartitions for joins/aggs/windows — which the
    * RoundRobin fan-out is not.
    */
  private def shuffles(p: String): Int = {
    val headers = p.linesIterator.zipWithIndex.collect {
      case (l, i) if l.matches("""^\(\d+\) Exchange\s*$""") =>
        l.trim.takeWhile(_ != ')').drop(1)
    }.toSeq
    // detail section: "(n) Exchange" header followed by "Arguments: ..."
    val lines = p.linesIterator.toVector
    headers.count { n =>
      val idx = lines.indexWhere(_.startsWith(s"($n) Exchange"))
      val args = lines.drop(idx).find(_.trim.startsWith("Arguments:")).getOrElse("")
      !args.contains("RoundRobinPartitioning")
    }
  }

  test("q_agg_groupby pushes the date filter into the parquet scan") {
    val p = plan("q_agg_groupby")
    assert(p.contains("PushedFilters:") && p.contains("LessThanOrEqual(l_shipdate"))
    // column pruning: shipdate present, orderkey pruned away
    assert(p.contains("l_shipdate") && !p.contains("l_orderkey"))
  }

  test("q_agg_groupby aggregates carry no decimal sum (int128 fast path)") {
    // r12 money sweep: every sum in A1 goes through sum_cents_exact (long
    // buffer, fast-hash-map eligible). One sum(decimal) buffer is
    // decimal(22,2) > 18 digits → evicts the WHOLE aggregate from
    // HashAggregate's primitive fast map (the r12 adjudication's root
    // cause); this pin keeps the regression loud.
    val p = plan("q_agg_groupby")
    assert(p.contains("sum_cents_exact"), p.take(4000))
    assert(!p.contains("sum(cast("), p.take(4000))
  }

  test("q_join_broadcast never shuffles the fact table") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    // the only Exchange allowed is the final tiny group-by on n_name
    assert(shuffles(p) <= 1, s"unexpected shuffles:\n$p")
  }

  test("q_topn_per_group is a single-exchange window with group-limit pushdown") {
    val p = plan("q_topn_per_group")
    assert(shuffles(p) == 1, p)
    assert(!p.contains("TakeOrderedAndProject"))
    // Spark 4 inserts WindowGroupLimit (partial per-partition top-k before
    // the shuffle) for rank<=k filters — pin it so a plan regression shows
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_ann_bruteforce pushes the query-set predicate to the scan") {
    val p = plan("q_ann_bruteforce")
    assert(p.contains("LessThan(vec_id,20)"))
  }

  test("q_grep prunes to the three projected columns") {
    val p = plan("q_grep")
    assert(!p.contains("lang") && !p.contains("embedding"))
  }

  test("q_asof_join is the single-shuffle tagged-union window (no per-row subquery)") {
    val p = plan("q_asof_join")
    assert(shuffles(p) == 1, s"asof = union + ONE window exchange:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_semi_join plans a left-semi (existence check, no row duplication)") {
    val p = plan("q_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("q_hash_split is a pure narrow transform (no shuffle)") {
    assert(shuffles(plan("q_hash_split")) == 0)
  }

  test("q_tfidf scans the corpus once (plus a column-less count scan)") {
    val p = plan("q_tfidf")
    val scans = p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet\s*$"""))
    assert(scans <= 2, s"expected ≤2 scans (tf + count-only), got $scans:\n$p")
    assert(p.contains("WindowGroupLimit"), "top-N rank filter should prune partially")
  }

  test("q_sample_uniform is a TakeOrdered top-k, not a global sort") {
    val p = plan("q_sample_uniform")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(shuffles(p) == 0, s"top-k must not range-shuffle:\n$p")
  }

  test("q_skew_join_salted broadcasts the replicated dim; fact side never shuffles pre-agg") {
    val p = plan("q_skew_join_salted")
    assert(p.contains("BroadcastHashJoin"))
    assert(shuffles(p) <= 1, s"only the final group-by may exchange:\n$p")
  }

  test("q_domain_mix is a zero-shuffle narrow scan") {
    val p = plan("q_domain_mix")
    assert(shuffles(p) == 0, s"acceptance sampling must not shuffle:\n$p")
    assert(!p.contains(" text"), "text column pruned from the scan")
  }

  test("q_pii_redact is a zero-shuffle narrow scan") {
    assert(shuffles(plan("q_pii_redact")) == 0)
  }

  test("q_pack_sequences is one exchange (the shard window) and prunes to doc_id+text") {
    val p = plan("q_pack_sequences")
    assert(shuffles(p) == 1, s"shard repartition is the only exchange:\n$p")
    assert(!p.contains("n_chars") && !p.contains("source"), "unused columns pruned")
  }

  test("q_decontaminate broadcasts the benchmark grams; corpus text never shuffles") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    // exchanges: benchmark distinct (tiny) + final per-doc count agg —
    // the corpus gram rows reach the join without shuffling
    assert(shuffles(p) <= 2, s"corpus side must stay narrow:\n$p")
  }

  test("q_decontaminate_semantic broadcasts the benchmark; one per-vector exchange") {
    val p = plan("q_decontaminate_semantic")
    // the benchmark side ships to every task (cross product is the exact
    // check's compute, not a planning accident)...
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // ...and the best-match reduction is a partial-aggregated struct-max:
    // the only keyed exchange carries one row per corpus vector, never
    // the |corpus|x|bench| fan-out (a window here would shuffle it all)
    assert(shuffles(p) == 1, s"one keyed exchange (the per-vector max):\n$p")
    assert(!p.contains("Window"), "no window over the fanned rows")
  }

  test("q_benchmark_exposure broadcasts both benchmark sides; no window, bounded exchanges") {
    val p = plan("q_benchmark_exposure")
    // n-gram side: corpus grams probe the broadcast benchmark grams;
    // semantic side: the C55 BNLJ with the capped benchmark shipped
    assert(p.contains("BroadcastHashJoin") && p.contains("BroadcastNestedLoopJoin"), p)
    // both reductions are partial aggs — the keyed exchanges carry
    // (item, doc) hit pairs and one best-match row per (item, partition),
    // never raw text/vectors; the rk=1 selection is a struct-max, not a
    // window over the |corpus|x|bench| fan-out
    assert(!p.contains("Window"), "no window over the fanned rows")
    assert(shuffles(p) <= 6, s"corpus text/vectors must not shuffle raw:\n$p")
  }

  test("q_repeated_spans is scan + one aggregation keyed by the span hash") {
    val p = plan("q_repeated_spans")
    // distinct-count rewrites to a two-phase agg: (span) then (span,doc)
    assert(shuffles(p) <= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), "no join in span counting")
  }

  test("q_tpch_q3 pushes both date filters, broadcasts customers, TakeOrdered top-10") {
    val p = plan("q_tpch_q3")
    assert(p.contains("GreaterThan(l_shipdate") && p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "global top-10 must not be a full sort")
  }

  test("q_tpch_q5 pushes the region/date filters and broadcasts the snowflake dims") {
    val p = plan("q_tpch_q5")
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate") && p.contains("LessThan(o_orderdate"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
  }

  test("q_semdedup shuffles once (by cluster id); pairs never materialize as a join") {
    val p = plan("q_semdedup")
    assert(shuffles(p) == 1, s"cell grouping is the only exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q_quality_filter is a zero-shuffle narrow scan pruned to doc columns") {
    val p = plan("q_quality_filter")
    assert(shuffles(p) == 0, s"the cascade must compose with the ingest scan:\n$p")
    assert(!p.contains("n_tokens"), "reads only doc_id/source/text/n_chars")
  }

  test("q_repetition is a zero-shuffle narrow scan") {
    val p = plan("q_repetition")
    assert(shuffles(p) == 0, s"repetition features are per-row arithmetic:\n$p")
  }

  test("q_sample_stratified is one window exchange with group-limit pushdown") {
    val p = plan("q_sample_stratified")
    assert(shuffles(p) == 1, s"only the source-keyed window exchange:\n$p")
    assert(p.contains("WindowGroupLimit"), "rk<=k must prune partially per partition")
  }

  test("q_dedup_paragraph is one span-hash exchange serving both windows") {
    val p = plan("q_dedup_paragraph")
    assert(shuffles(p) == 1, s"count + rank must ride ONE phash exchange:\n$p")
  }

  test("q_triangles never plans a cartesian or nested-loop join") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge + closure joins must stay equi-joins:\n$p")
  }

  test("q_source_overlap scans documents once — set-collect, not a self-join") {
    val p = plan("q_source_overlap")
    assert(!p.contains("Join"), s"pairs must explode in-row from the source set:\n$p")
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet.*""")) == 1,
      s"one documents scan:\n$p")
    // the hash-keyed set-collect is the only corpus exchange; the cell agg
    // shuffles #sources² rows
    assert(shuffles(p) == 2, s"shingle group + cell agg only:\n$p")
  }

  test("q_oov_rate bloom-prunes the token stream BELOW the vocab join (gated path)") {
    // force the Bloom arm of the gate — below bloomMinRefDocs the operator
    // (correctly) plans a plain broadcast join instead
    val sp = graft.operators.TextAnalysis.oovRate(spark, sf, bloomMinRefDocs = 0L)
      .queryExecution.sparkPlan
    val joins = sp.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, s"vocab membership join missing:\n$sp")
    // the streamed (fact) side of the membership join must be pre-filtered
    // by the bloom probe — that filter is what keeps definite-OOV tokens
    // out of the join input
    val factSide = joins.head.children.head
    val bloomBelowJoin = factSide.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.find(
            _.isInstanceOf[graft.operators.BloomJoin.BloomMightContain]).isDefined => f
    }
    assert(bloomBelowJoin.nonEmpty,
      s"bloom probe filter must sit below the join on the token side:\n$sp")
    // and the definite-OOV branch bypasses the join entirely (a Union arm
    // with no join in it, flowing straight to the partial agg)
    val unions = sp.collect { case u: org.apache.spark.sql.execution.UnionExec => u }
    assert(unions.exists(_.children.exists(_.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty)), s"definite-OOV arm must not pass through the join:\n$sp")
  }

  test("q_oov_rate below the gate is one broadcast join, no bloom, no union") {
    // the registered query at spec SF sits far below bloomMinRefDocs: the
    // vocab broadcasts, no filter build job, no two-arm union
    val sp = SparkEntry.queries("q_oov_rate")(spark, sf).queryExecution.sparkPlan
    assert(sp.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, s"vocab must broadcast below the gate:\n$sp")
    assert(sp.collect { case u: org.apache.spark.sql.execution.UnionExec => u }.isEmpty,
      s"no bloom split below the gate:\n$sp")
    assert(sp.find(_.expressions.exists(_.find(
      _.isInstanceOf[graft.operators.BloomJoin.BloomMightContain]).isDefined)).isEmpty,
      s"no bloom probe below the gate:\n$sp")
  }

  test("ANN re-ranks ride WindowGroupLimit partial top-k on one exchange") {
    // the §7c backlog asked whether the candidate re-rank needed
    // TopK.perGroup — it doesn't: the rank<=k filter already plans partial
    // group-limit pruning before the single shuffle in every ANN query
    for (q <- Seq("q_ann_pq", "q_ann_ivf", "q_ann_ivfpq")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q lost group-limit pruning:\n$p")
      assert(shuffles(p) == 1, s"$q re-rank must be the only exchange:\n$p")
    }
  }

  test("q_tpch_q6 is a pure pushed-down scan: no join, one 1-row exchange") {
    val p = plan("q_tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"all three predicates must reach the scan:\n$p")
    assert(!p.contains("Join"), s"Q6 has no join:\n$p")
    assert(shuffles(p) == 1, s"partial agg + single-row exchange only:\n$p")
  }

  test("q_tpch_q10 pushes both fact filters and takes top-20 before decoration") {
    val p = plan("q_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag must reach the scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"quarter filter must reach the scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation/customer decoration must broadcast:\n$p")
  }

  test("q_window_range plans a RangeFrame on one user-keyed exchange") {
    val p = plan("q_window_range")
    assert(p.contains("RangeFrame"), s"value-bounded frame must plan as RangeFrame:\n$p")
    assert(shuffles(p) <= 2, s"daily agg + user window only:\n$p")
  }

  test("q_tpch_q12 pushes the year filter and partial-aggregates the CASE counts") {
    val p = plan("q_tpch_q12")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"year filter must reach the scan:\n$p")
    // lineitem pruned to two columns before the join
    assert(!p.contains("l_extendedprice"), s"money columns must prune away:\n$p")
    // partial_sum = the CASE counters combine map-side after the join
    assert(p.contains("partial_sum"), s"conditional counts must partial-agg:\n$p")
  }

  test("q_tpch_q14 pushes the month filter; the 1-row agg adds one exchange") {
    val p = plan("q_tpch_q14")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"month filter must reach the scan:\n$p")
    // part pruned to (partkey, type): no name/brand/price in the plan
    assert(!p.contains("p_retailprice"), s"part must prune to 2 columns:\n$p")
    // join exchanges depend on AQE's broadcast choice at this SF; the
    // global agg itself must stay a single 1-row exchange
    assert(p.contains("partial_sum"), s"revenue sums must partial-agg:\n$p")
  }

  test("q_tpch_q4 plans the EXISTS as a LeftSemi join with the quarter pushed down") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi-join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"quarter filter must reach the scan:\n$p")
    // lineitem pruned to (orderkey, shipdate): no payload columns cross the join
    assert(!p.contains("l_extendedprice") && !p.contains("l_quantity"),
      s"lineitem must prune to 2 columns:\n$p")
  }

  test("q_tpch_q13 keeps order-less customers and reuses the custkey partitioning") {
    val p = plan("q_tpch_q13")
    assert(p.contains("LeftOuter"), s"0-bucket customers must survive the join:\n$p")
    // join + per-customer count + tiny distribution agg: the custkey agg
    // must reuse the join's partitioning, not add a fourth exchange
    assert(shuffles(p) <= 3, s"custkey agg must reuse the join exchange:\n$p")
  }

  test("q_tpch_q7 pushes the ship window and broadcasts the 2-nation supplier set") {
    val p = plan("q_tpch_q7")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"ship window must reach the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"2-nation supplier set must broadcast:\n$p")
    // the cross-pair inequality is a residual on the customer join, never
    // a post-join Filter over the agg
    assert(p.contains("NOT (supp_nation"), s"pair inequality must ride the join:\n$p")
  }

  test("q_tpch_q8 pushes type/region/date filters and broadcasts supplier 2-wide") {
    val p = plan("q_tpch_q8")
    assert(p.contains("EqualTo(p_type,ECONOMY)"), s"part type must reach the scan:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter must reach the scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"year window must reach the scan:\n$p")
    assert(p.contains("LeftSemi"), s"region customers must semi-join (no row growth):\n$p")
    assert(!p.contains("s_name"), s"supplier must prune to (suppkey, nationkey):\n$p")
  }

  test("q_tpch_q15 aggregates lineitem ONCE; the max joins back as a 1-row broadcast") {
    val p = plan("q_tpch_q15")
    // the checkpointed per-supplier agg is the plan's ONLY source — the
    // winner selection and the scalar max both read it, so lineitem never
    // appears (one scan happened at checkpoint time, not two in this plan)
    assert(p.contains("Scan ExistingRDD"), s"per-supplier agg must be checkpointed:\n$p")
    assert(!p.contains("Scan parquet") || !p.contains("l_extendedprice"),
      s"winner selection must reuse the checkpointed agg, not re-scan lineitem:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"scalar max must broadcast back:\n$p")
  }

  private def lineitemScans(p: String): Int =
    p.split("lineitem\\.parquet", -1).length - 1

  test("q_tpch_q2 scans the part-pruned lineitem once and takes top-100 without a global sort") {
    val p = plan("q_tpch_q2")
    // the partsupp derivation reads lineitem exactly once, pre-pruned by
    // the broadcast part-key semi-join
    assert(lineitemScans(p) == 1, s"partsupp must derive from ONE scan:\n$p")
    assert(p.contains("LeftSemi"), s"part keys must prune lineitem pre-agg:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"EUROPE suppliers must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
  }

  test("q_tpch_q9 feeds detail AND partsupp from one checkpointed scan") {
    val p = plan("q_tpch_q9")
    // the name-filtered lineitem materialized once (Q15 pattern); both the
    // detail side and the partsupp agg read the checkpoint, never parquet
    assert(p.contains("Scan ExistingRDD"), s"filtered lineitem must checkpoint:\n$p")
    assert(lineitemScans(p) == 0, s"no second lineitem scan allowed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier/nation must broadcast:\n$p")
  }

  test("q_tpch_q11 re-aggregates its own per-part result for the global total") {
    val p = plan("q_tpch_q11")
    // the per-part value checkpointed once; the scalar total is a 1-row
    // re-agg of it broadcast back — lineitem never re-scans
    assert(p.contains("Scan ExistingRDD"), s"per-part value must checkpoint:\n$p")
    assert(lineitemScans(p) == 0, s"total must reuse the checkpointed agg:\n$p")
  }

  test("q_tpch_q16 anti-joins the denylist broadcast and prunes parts at the scan") {
    val p = plan("q_tpch_q16")
    assert(p.contains("LeftAnti"), s"denylist must plan as an anti join:\n$p")
    assert(p.contains("In(p_size"), s"size set must push to the part scan:\n$p")
    assert(lineitemScans(p) == 1, s"pairs derive from ONE lineitem scan:\n$p")
  }

  test("q_tpch_q20 pushes the 1998 range to the scan and never re-scans for the part total") {
    val p = plan("q_tpch_q20")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate"),
      s"year filter must push as a shipdate RANGE:\n$p")
    assert(p.contains("LeftSemi"), s"red-part keys must semi-prune the scan:\n$p")
    assert(lineitemScans(p) == 1, s"per-part total is a window, not a re-scan:\n$p")
  }

  test("q_tpch_q17 filters parts at the scan and derives per-part stats in one window") {
    val p = plan("q_tpch_q17")
    assert(p.contains("EqualTo(p_brand,Brand#3)"), s"brand filter must reach the scan:\n$p")
    assert(p.contains("LeftSemi"), s"part filter must semi-join (no column growth):\n$p")
    // one partkey exchange for the window; the final agg is 1-row
    assert(shuffles(p) <= 2, s"window + 1-row agg only:\n$p")
  }

  test("q_tpch_q19 pushes the lossless hull of the disjunction to both scans") {
    val p = plan("q_tpch_q19")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      p.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"quantity hull must reach the lineitem scan:\n$p")
    assert(p.contains("In(p_brand"), s"brand set must reach the part scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"hull-filtered part set must broadcast:\n$p")
  }

  test("q_tpch_q21 answers both EXISTS subqueries from ONE per-order aggregate") {
    val p = plan("q_tpch_q21")
    assert(p.contains("EqualTo(o_orderstatus,F)"), s"status filter must reach the scan:\n$p")
    // one fact-fact join + one orderkey agg (+ expand for the two distincts)
    // + the tiny supplier agg — never a second lineitem scan (4 scans total:
    // lineitem, orders, supplier, nation; detail headers count each once)
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet .*""")) <= 4,
      s"lineitem must scan once:\n$p")
    assert(!p.contains("l_extendedprice"), s"lineitem must prune to 12 bytes/row:\n$p")
  }

  test("q_tpch_q22 broadcasts the 1-row stats and anti-joins date-pruned orders") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), s"dormancy test must plan as an anti join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"recency cutoff must reach the orders scan:\n$p")
    assert(!p.contains("o_totalprice"), s"orders must prune to o_custkey:\n$p")
  }

  test("q_collocations fans out bigrams narrowly and takes top-50 without a global sort") {
    val p = plan("q_collocations")
    // bigrams come from transform(sequence) + explode — never a (doc, pos)
    // self-join. The plan legitimately contains BNLJs, but only for the two
    // 1-row corpus-total broadcasts (n_tok × n_big, then totals × the scored
    // bigrams); cap the count so a positional self-join (which would add a
    // third, with a non-singleton build side) still fails the pin.
    assert(p.contains("Generate"), s"bigram fan-out must be a narrow explode:\n$p")
    val bnlj = p.linesIterator.count(_.matches("""^\(\d+\) BroadcastNestedLoopJoin.*"""))
    assert(bnlj <= 2, s"only the two 1-row totals broadcasts may BNLJ (saw $bnlj):\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast positional self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-50 must not global-sort:\n$p")
    // only doc text is read: no metadata columns survive pruning
    assert(!p.contains("n_chars") && !p.contains("lang"), s"scan must prune to text:\n$p")
  }

  test("q_lm_score: two narrow scans, model broadcast, corpus never shuffles") {
    val p = plan("q_lm_score")
    // the score pass is the only VISIBLE corpus scan — the train pass is
    // sealed inside the model checkpoint (c12 materializes once; the c1
    // derivation and the p join both read the 961-row RDD, so neither can
    // replay the train scan)
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet .*""")) == 1,
      s"score pass scans the corpus once; train pass is checkpointed:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"model must come from the checkpoint:\n$p")
    assert(p.contains("Generate"), s"bigram fan-out must be a narrow explode:\n$p")
    // the bigram LM joins as a BROADCAST (the model ships to workers; the
    // occurrence stream never shuffles) — and model counts are aggregates,
    // never token-keyed windows (Zipf skew a window cannot split;
    // window form measured 10x slower at sf10)
    assert(p.contains("BroadcastHashJoin"), s"p table must broadcast:\n$p")
    assert(!p.contains("Window"), s"no token-keyed window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // exchanges: the two model aggs (combiner-shrunk to model size) and
    // the map-side-combined doc agg
    assert(shuffles(p) <= 3, s"model aggs + doc agg only:\n$p")
    // only text+doc_id read: no metadata columns survive pruning
    assert(!p.contains("n_chars") && !p.contains("lang"), s"scan must prune:\n$p")
  }

  test("q_dsir_weight: fixed-bucket model broadcasts; corpus never shuffles") {
    val p = plan("q_dsir_weight")
    // bigram fan-out is a narrow explode; bucket hashing rides the scan
    assert(p.contains("Generate"), s"bigram fan-out must be a narrow explode:\n$p")
    // the model is a `buckets`-row table regardless of corpus size — it
    // must join as a BROADCAST; occurrences never hash-shuffle on bucket
    assert(p.contains("BroadcastHashJoin"), s"bucket model must broadcast:\n$p")
    assert(!p.contains("Window"), s"model counts are aggs, never windows:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // exchanges: the model agg (combiner-shrunk to ≤buckets partials per
    // task) and the map-side-combined per-doc agg
    assert(shuffles(p) <= 2, s"model agg + doc agg only:\n$p")
    // lang is the target label (read); source/n_chars must prune away
    assert(!p.contains("n_chars") && !p.contains("source"), s"scan must prune:\n$p")
  }

  test("q_dsir_resample adds only the acceptance filter to the weight plan") {
    val p = plan("q_dsir_resample")
    assert(p.contains("BroadcastHashJoin"), s"bucket model must broadcast:\n$p")
    assert(shuffles(p) <= 2, s"hash acceptance must not add a shuffle:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_grouping_sets: one Expand + one agg exchange for all three lattices") {
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets must plan through Expand:\n$p")
    // one shuffle for the combined agg (plus nothing per set) — the point
    // of the operator vs three scans + a union
    assert(shuffles(p) <= 1, s"one agg exchange for all sets:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer dim must broadcast:\n$p")
  }

  test("q_bpe_tokenize applies the merge table as a zero-shuffle narrow scan") {
    val p = plan("q_bpe_tokenize")
    assert(shuffles(p) == 0, s"model-apply must be narrow:\n$p")
    assert(!p.contains("Join"), s"merges are kernel literals, not a join:\n$p")
    // only doc_id+text read
    assert(!p.contains("n_chars") && !p.contains("lang"), s"scan must prune:\n$p")
  }

  test("q_dedup_incremental broadcasts the batch probe; the corpus index never shuffles to meet it") {
    val p = plan("q_dedup_incremental")
    // the band probe must be a broadcast join with the (small) batch side
    // built — at 100 TB a shuffle here would move the corpus index to the
    // delta; the verify joins on candidate ids may shuffle (candidate-sized)
    assert(p.contains("BroadcastHashJoin"), s"batch bands must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // one shingle pass serves index, probe, and both verify sides
    assert(p.contains("Scan ExistingRDD"), s"shingles come from the checkpoint:\n$p")
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet .*""")) == 0,
      s"no direct corpus re-scan:\n$p")
  }

  test("q_curate_pipeline: anti-join singleton branch, no cartesian, window only on clustered docs") {
    val p = plan("q_curate_pipeline")
    assert(!p.contains("CartesianProduct"), p)
    // the singleton branch must be a join-free-of-window LeftAnti + Union —
    // windowing the full survivor corpus is the naive formulation this
    // operator exists to avoid
    assert(p.contains("LeftAnti"), s"singletons take the anti-join branch:\n$p")
    assert(p.contains("Union"), s"clustered ∪ singleton:\n$p")
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Window\s*$""")) <= 1,
      s"one keep-best window, on the clustered fraction only:\n$p")
  }

  test("q_cluster_prune: narrow fused assignment, one cid exchange, group-limit pushdown") {
    val p = plan("q_cluster_prune")
    // centroids are literals inside the fused kernel — assignment is a
    // narrow scan, NOT a join against a centroid table
    assert(!p.contains("Join"), s"assignment must not plan as a join:\n$p")
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet .*""")) == 1,
      s"one embeddings scan:\n$p")
    assert(shuffles(p) == 1, s"only the cid-keyed window exchange:\n$p")
    // rank<=keep pushes partial per-cell top-k map-side: the exchange
    // carries ≤ cells·keep·tasks triples, never the corpus
    assert(p.contains("WindowGroupLimit"), s"group-limit pushdown missing:\n$p")
    // label/nrm pruned: only vec_id+embedding read
    assert(!p.contains("label"), s"scan must prune to vec_id+embedding:\n$p")
  }

  test("q_tpch_q18 plans TakeOrdered top-100 and broadcasts the small sides") {
    val p = plan("q_tpch_q18")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"qualifying set / customer broadcast:\n$p")
  }

  test("q_dedup_substring: window-hash agg + islands window, no text in shuffles") {
    val p = plan("q_dedup_substring")
    // occurrence-count agg + doc-keyed islands window; the position
    // semi-join broadcasts the (small) repeated-hash set at this SF and may
    // add one more exchange when it degrades to SMJ at scale
    assert(shuffles(p) <= 3, s"hash agg + islands window (+ join at scale):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_funnel rides ONE user_id exchange (stacked windows + same-key agg)") {
    val p = plan("q_funnel")
    // three dependent stage windows share the user_id partitioning and the
    // final per-user groupBy reuses it — no second shuffle, no join
    assert(shuffles(p) == 1, s"funnel must be a single user_id exchange:\n$p")
    assert(!p.contains("Join"), s"the window cascade replaces stage self-joins:\n$p")
  }

  test("q_retention shuffles at most twice (user window + cell agg)") {
    val p = plan("q_retention")
    // the user_id window partitioning already co-locates the distinct's
    // (cohort, offset, user_id) phase; only the final cell agg re-shuffles
    assert(shuffles(p) <= 2, s"cohort window + distinct-count cell agg only:\n$p")
    assert(!p.contains("Join"), s"the window replaces the first-seen self-join:\n$p")
  }

  test("q_inverted_index: Zipf-safe — partial group-limit caps champions, stats are aggregates") {
    val p = plan("q_inverted_index")
    // the hot-key cap: the rank filter compiles to a PARTIAL WindowGroupLimit
    // BEFORE the word exchange, so a stopword ships ≤ champions rows per map
    // task instead of its df
    assert(p.linesIterator.exists(_.contains("row_number(), 8, Partial")),
      s"champion rank must prune map-side (WindowGroupLimit Partial):\n$p")
    // df/cf are hash AGGREGATES with map-side combine — the r10 form's
    // count/sum windows materialized a df-sized partition on one task
    assert(p.contains("partial_count(1), partial_sum"),
      s"df/cf must be partial-combined aggregates, not windows:\n$p")
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("row_number()")),
      s"the ONLY window function allowed is the champion rank:\n$p")
    // shuffles carry (word, doc_id, tf) triples — text dies at the explode
    assert(p.contains("Generate"), s"occurrence fan-out must be a narrow explode:\n$p")
    // tf agg + stats word agg + champions word exchange (the duplicated tf
    // exchange in the initial plan dedupes at runtime — asserted below)
    assert(shuffles(p) <= 4, s"tf agg (×2 pre-reuse) + stats agg + champion window:\n$p")
    // runtime: AQE reuses the tf exchange — ONE corpus scan feeds both
    // the stats aggregate and the champion window
    val df = SparkEntry.queries("q_inverted_index")(spark, sf)
    df.collect()
    val exec = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(exec.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"the corpus must be scanned once (tf exchange reused):\n$exec")
    assert(exec.contains("Reused"), s"expected a reused tf exchange:\n$exec")
  }

  test("q_bm25: one sealed corpus scan, model sides broadcast, top-k never global-sorts") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    // the single tokenize scan is sealed inside the cnt checkpoint — every
    // visible input is a re-read of that compact materialized RDD, so a
    // parquet scan appearing here means a derivation re-scanned the corpus
    assert(p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet .*""")) == 0,
      s"all derivations must read the checkpointed cnt table:\n$p")
    // corpus stats (1 row) and per-term df (|Q| rows) broadcast; the only
    // BNLJ allowed is the singleton stats cross join
    val bnlj = p.linesIterator.count(_.matches("""^\(\d+\) BroadcastNestedLoopJoin.*"""))
    assert(bnlj <= 1, s"only the 1-row stats broadcast may BNLJ (saw $bnlj):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"the df side must broadcast:\n$p")
    // every post-checkpoint shuffle carries pre-aggregated compact rows:
    // dl agg, join alignment, stats/df model aggs, final doc agg
    assert(shuffles(p) <= 5, s"only compact post-checkpoint exchanges:\n$p")
  }

  test("q_text_knn broadcasts the probe set; the corpus side never shuffles pre-window") {
    val p = plan("q_text_knn")
    // probe×corpus is a non-equi (!=) join with the probe side broadcast —
    // exactly one BNLJ, and the only exchange is the probe_id rank window
    val bnlj = p.linesIterator.count(_.matches("""^\(\d+\) BroadcastNestedLoopJoin.*"""))
    assert(bnlj == 1, s"the broadcast probe join must be the only BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(shuffles(p) == 1, s"corpus scan -> score -> ONE window exchange:\n$p")
    assert(p.contains("WindowGroupLimit"), s"per-probe top-k must prune map-side:\n$p")
  }

  test("q_rank_fusion fuses two bounded heads — no corpus-sized join") {
    val p = plan("q_rank_fusion")
    // the lexical head keeps bm25's TakeOrdered; the fusion join runs on
    // two <=k-row rank lists
    assert(p.contains("TakeOrderedAndProject"), s"bm25 head must stay TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("FullOuter"), s"fusion must keep single-system docs:\n$p")
  }

  test("q_heavy_hitters verify pass: one candidate-filtered agg exchange, no window/join") {
    val p = plan("q_heavy_hitters")
    // the sketch pass already ran (model-sized head() inside the builder);
    // the VISIBLE plan is the exact verify pass: narrow fan-out, candidate
    // In-filter, one word agg — never a full-vocabulary ranking
    assert(shuffles(p) == 1, s"verify = one word-agg exchange:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    // >10 candidates fold to INSET; keep both spellings acceptable
    assert(p.contains("word#") && (p.contains(" IN ") || p.contains(" INSET ")),
      s"candidate filter must gate the agg:\n$p")
  }

  test("q_corpus_profile is one narrow scan + one source agg — no token fan-out") {
    val p = plan("q_corpus_profile")
    assert(shuffles(p) == 1, s"profile = map-side partials + |sources| rows:\n$p")
    // token counts come from size(filter(split)) — never an explode
    assert(!p.contains("Generate"), s"no per-token fan-out in a profile scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q_chunk_overlap is a zero-shuffle narrow fan-out") {
    val p = plan("q_chunk_overlap")
    assert(shuffles(p) == 0, s"chunking must not shuffle anything:\n$p")
    assert(p.contains("Generate"), s"chunk starts fan out via explode:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q_outliers broadcasts the moments; the event scan never shuffles") {
    val p = plan("q_outliers")
    assert(p.contains("BroadcastHashJoin"), s"|types|-row moments must broadcast:\n$p")
    // the only exchange is the moments agg itself (plus its 1-row-per-type
    // partials); the flag scan is narrow
    assert(shuffles(p) <= 1, s"one moments exchange only:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q_scd2 rides ONE user_id exchange (version, lead and flag share the sort)") {
    val p = plan("q_scd2")
    assert(shuffles(p) == 1, s"scd2 must be a single user window:\n$p")
    assert(!p.contains("Join"), s"interval close is lead(), not a self-join:\n$p")
    val windows = p.linesIterator.count(_.matches("""^\(\d+\) Window\s*$"""))
    assert(windows == 1, s"row_number + lead must share one Window node:\n$p")
  }

  test("q_event_transitions: one user window, model-table windows ride tiny aggs") {
    val p = plan("q_event_transitions")
    // user window exchange + pair agg exchange + from_type window on the
    // |types|^2-row model table — never a second event-scale shuffle
    assert(shuffles(p) <= 3, s"transitions must stay within 3 exchanges:\n$p")
    assert(!p.contains("Join"), s"lag(), not a self-join:\n$p")
  }

  test("q_drift_ks: 1-row midpoint broadcast, windows on the histogram table only") {
    val p = plan("q_drift_ks")
    // the only nested-loop join is the 1-row bounds broadcast (the E14/SQ8
    // two-pass device)
    assert(p.contains("BroadcastNestedLoopJoin"), s"midpoint must broadcast:\n$p")
    // (type,cents) agg + type window; the final per-type agg reuses the
    // window's type partitioning (subset rule) and the 1-row bounds agg is
    // a single-partition exchange
    assert(shuffles(p) <= 3, s"drift must not shuffle events twice:\n$p")
  }

  test("q_drift_psi: one events scan, 1-row midpoint broadcast, histogram-sized work after") {
    val p = plan("q_drift_psi")
    assert(p.contains("BroadcastNestedLoopJoin"), s"midpoint must broadcast:\n$p")
    // TWO scans of events: the data scan + the 1-row midpoint bounds agg
    // (the E14/SQ8 two-pass device, same as the KS sibling). The
    // closed-form empty-bin fill keeps it at two — a (type × bin) grid
    // branch would re-plan a THIRD. Formatted mode prints each operator
    // twice (tree + detail), so ≤2 scans ⇔ ≤4 occurrences.
    assert(p.split("Scan parquet").length - 1 <= 4,
      s"PSI must scan events at most twice (data + 1-row bounds):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(shuffles(p) <= 3, s"PSI must not shuffle events twice:\n$p")
  }

  test("q_copurchase: in-row pair comprehension, no self-join, TakeOrdered cutoff") {
    val p = plan("q_copurchase")
    assert(!p.contains("Join"), s"pairs come from the basket array, never a fact self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-50 must not global-sort:\n$p")
    // basket agg (orderkey) + pair agg — two data exchanges
    assert(shuffles(p) <= 2, s"copurchase is two aggs:\n$p")
    assert(p.contains("Generate"), s"pairs explode from the comprehension:\n$p")
  }

  test("q_merge_upsert: latest-wins is an aggregation, never a window over the fact") {
    val p = plan("q_merge_upsert")
    assert(!p.contains("Window"), s"max(struct) partials replace row_number:\n$p")
    assert(p.contains("FullOuter"), s"snapshot and changelog meet full-outer:\n$p")
    // two half aggs + the key join; the 1-row midpoint is a broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), s"midpoint must broadcast:\n$p")
    assert(shuffles(p) <= 4, s"merge is two aggs + one key join:\n$p")
  }

  test("q_k_anonymize: QI count tables broadcast back — the fact never shuffles") {
    val p = plan("q_k_anonymize")
    assert(p.contains("BroadcastHashJoin"), s"count tables are broadcast-scale:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-side shuffle join:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), s"one projection decides the ladder, not re-planned branches:\n$p")
    // the only data exchanges are the QI census + the (tiny) policy join
    assert(shuffles(p) <= 3, s"ladder must not shuffle the fact:\n$p")
  }

  test("q_ann_filtered: the label predicate makes the search a broadcast HASH join") {
    val p = plan("q_ann_filtered")
    // C6's unfiltered form is a broadcast nested loop (every query × every
    // vector); the pre-filter turns it into an equi-join on label — each
    // corpus vector is scored against only its label's queries
    assert(p.contains("BroadcastHashJoin"), s"label must be the join key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no theta join:\n$p")
  }

  test("q_entity_resolve: entity-granularity resolve, verdicts broadcast to records") {
    val p = plan("q_entity_resolve")
    // the record-scale side joins the candidate lists by broadcast and
    // reduces in-row; no record-scale SMJ anywhere
    assert(p.contains("BroadcastHashJoin"), s"candidate lists must broadcast:\n$p")
    // entity collapse + blocking groupByKey + pair distinct + list agg —
    // all ENTITY-sized exchanges; the record side contributes none
    assert(shuffles(p) <= 6, s"unexpected record-scale shuffles:\n$p")
  }

  test("q_zorder3_scan: the cents predicate reaches the clustered scan; agg-only shuffles") {
    val p = plan("q_zorder3_scan")
    // the predicate on the LAST clustering dimension is pushed to the
    // parquet scan of the k-dim clustered copy — at scale the footer
    // min/max stats turn it into file skips (LifecycleSpec measures the
    // rate; this pin keeps the pushdown from silently degrading)
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(cents,100"), p.take(4000))
    // read path: one scan of the clustered copy, then the group-by and
    // the distinct-user rewrite — no join, no window, nothing row-scale
    // beyond the aggregation
    assert(shuffles(p) <= 2, s"unexpected shuffles:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p.take(4000))
  }

  test("q_timetravel: the pinned historical read is a plain scan — no join, agg-only shuffles") {
    val p = plan("q_timetravel")
    // a historical pin resolves to parquet scans over the generation's
    // files (live-dir survivors ∪ _pre_merge retirees) — reproducibility
    // surface, not a join: nothing row-scale beyond the group-by and the
    // distinct-customer rewrite
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(shuffles(p) <= 2, s"unexpected shuffles:\n$p")
  }

  test("q_ingest_read / q_erasure_read / q_erasure_dir: plain layout reads — no join, agg-only shuffles") {
    for (q <- Seq("q_ingest_read", "q_erasure_read", "q_erasure_dir")) {
      val p = plan(q)
      // serving shape after the lifecycle pass: ONE scan of the bucketed
      // table (manifest-pinned), then the group-by + distinct rewrite
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), s"$q:\n${p.take(4000)}")
      assert(!p.contains("Window"), s"$q:\n${p.take(4000)}")
      assert(shuffles(p) <= 2, s"$q — unexpected shuffles:\n$p")
    }
  }

  test("q_incremental_agg: the maintained aggregate serves with ZERO shuffles and zero agg work") {
    val p = plan("q_incremental_agg")
    // the whole point of incremental maintenance: serve time is a bare
    // bucketed scan — the recompute's full scan + shuffle was paid once,
    // incrementally, at maintenance time
    assert(shuffles(p) == 0, s"serve-time shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"serve-time aggregation:\n${p.take(4000)}")
  }
}

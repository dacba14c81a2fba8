package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the shapes the 100 TB posture
  * depends on (SCALING.md). These assert against the sf0.001 testdata
  * plans so a refactor that silently de-optimizes a query family
  * (loses a pushdown, widens a semi join, un-broadcasts a scalar
  * subquery) fails CI, not a cluster run. */
class PlanSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("EXISTS composite runs as a broadcast left-semi join with pushed filters (q_tpch4)") {
    val p = planOf("q_tpch4")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(l_returnflag,R)"))
  }

  test("NOT IN composite runs as a broadcast left-anti join (q_tpch16)") {
    val p = planOf("q_tpch16")
    assert(p.contains("LeftAnti"))
    assert(p.contains("LessThan(s_acctbal,0.0)"))
  }

  test("scalar-subquery composites broadcast the 1-row aggregate (q_tpch22, q_tpch11)") {
    val p22 = planOf("q_tpch22")
    assert(p22.contains("BroadcastNestedLoopJoin"))
    val p11 = planOf("q_tpch11")
    assert(p11.contains("BroadcastNestedLoopJoin") || p11.contains("BroadcastExchange"))
  }

  test("top-k per key is a rank over sort-within-partitions, no extra exchange (q_topk_per_key)") {
    val p = planOf("q_topk_per_key")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    // one exchange for the window partition key, one for the final sort
    assert("Exchange".r.findAllIn(p).size <= 3)
  }

  test("date-range composites push predicates into the parquet scan (q_tpch3)") {
    val p = planOf("q_tpch3")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || p.contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(p.contains("GreaterThan(l_shipdate,"))
  }

  test("as-of join is one keyed exchange + window carry-forward, no subquery join (q_asof_join)") {
    val p = planOf("q_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // union → one hash exchange on the key (+ final range sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("range join shuffles on the derived chunk id, never a theta join (q_range_join)") {
    val p = planOf("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("__chunk"))
  }

  test("embedding near-dup oracle form stays a broadcast nested-loop self-join (q_embed_neardup)") {
    val p = planOf("q_embed_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("two-nation volume query broadcasts both filtered dims (q_tpch7)") {
    val p = planOf("q_tpch7")
    assert(p.contains("BroadcastHashJoin"))
    // the 2-nation IN filter reaches the nation scan
    assert(p.contains("In(n_name,") || p.contains("n_name"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    assert(!p.contains("CartesianProduct"))
  }

  test("disjunctive-predicate query is one joined pass, no union of scans (q_tpch19)") {
    val p = planOf("q_tpch19")
    assert(!p.contains("Union"))
    assert(p.contains("BroadcastHashJoin"))
    // lineitem scanned exactly once
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1)
  }

  test("sole-blame composite runs semi+anti joins with residuals, never all-pairs (q_tpch21)") {
    val p = planOf("q_tpch21")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("order-count distribution keeps the status filter in the outer join (q_tpch13)") {
    val p = planOf("q_tpch13")
    assert(p.contains("LeftOuter"))
    // the o_orderstatus <> 'P' predicate must NOT become a post-join
    // filter (that would drop c_count=0 customers); it belongs to the
    // orders side / join condition
    assert(p.contains("Not(EqualTo(o_orderstatus,P))") || p.contains("NOT (o_orderstatus"))
  }

  test("sampleByHash is a per-partition top-n driver merge, not a global sort") {
    val df = spark.read.parquet(dir + "/orders.parquet")
    val p = graft.operators.Grouping.sampleByHash(df, "o_orderkey", 100)
      .queryExecution.executedPlan.toString
    // orderBy+limit must compile to TakeOrderedAndProject: each
    // partition keeps its local top-n, the driver merges n rows —
    // no Exchange rangepartitioning of the corpus
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("samplePerKeyByHash is one window exchange on the key (q_sample_per_key)") {
    val p = planOf("q_sample_per_key")
    assert(p.contains("Window"))
    // window key exchange + deterministic output sort, nothing else
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("simhash pairs stream through an equi-join on the chunk key, never a theta join (q_simhash)") {
    val p = planOf("q_simhash")
    // the pairing must be a hash/sort join ON THE CHUNK KEY (quadratic
    // work stays inside skewed buckets and STREAMS through codegen) —
    // a nested-loop/cartesian plan would mean the equi key got lost.
    // The collect_list bucket form was measured 3.6x slower here: the
    // pigeonhole chunk key is only 64/(maxDist+1) bits wide, buckets
    // grow with the corpus, and per-bucket pair arrays materialize
    // O(bucket^2) — see simhashPairsFromFp's Scaladoc.
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("span decontamination broadcasts the bench line set; strips never go quadratic") {
    // the benchmark's normalized-line set is eval-suite-small: the
    // anti-join must BUILD on it (broadcast), leaving the corpus side
    // streaming — and none of the strip/span family may degrade to a
    // nested-loop/cartesian pairing.
    val p = planOf("q_decontaminate_spans")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    for (q <- Seq("q_decontaminate_spans", "q_strip_lines", "q_strip_stride")) {
      val s = planOf(q)
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s"$q pairing degraded to a quadratic join")
      // the strips' corpus-wide counting must key on the 8-byte hash,
      // not raw text (spans joins on the broadcast normalized key)
      if (q.startsWith("q_strip"))
        assert(s.contains("xxhash64"), s"$q lost its hash-keyed count")
    }
  }

  test("canonical-URL dedup is one keyed exchange with map-side partial aggregation") {
    // the whole op must be aggregate-shaped: partial min/count before
    // the single hashpartitioning exchange on the canonical key (plus
    // the final presentation sort), never a join of any kind — a
    // viral URL pre-aggregates map-side instead of concentrating rows
    val p = planOf("q_url_dedup")
    assert(!p.contains("Join"), s"q_url_dedup grew a join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q_url_dedup should shuffle once on the canonical key:\n$p")
    // two aggregate nodes = partial + final (min(struct) aggregates
    // via SortAggregate; HashAggregate acceptable if Spark changes it)
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size == 2,
      s"q_url_dedup lost its partial aggregation:\n$p")
  }

  test("round-8 curation queries: equi-joins only, no single-partition windows (q_snapshot_neardup, q_pack_corpus, q_quality_model)") {
    // snapshot near-dup: band join + verify joins are all equi —
    // never a theta/cartesian between crawl and snapshot
    val ps = planOf("q_snapshot_neardup")
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoopJoin"),
      s"q_snapshot_neardup grew a non-equi join:\n$ps")
    // corpus packing: every window is shard-partitioned — a refactor
    // that drops the shard key would single-partition-sort the corpus
    val pp = planOf("q_pack_corpus")
    assert(!pp.contains("Exchange SinglePartition"),
      s"q_pack_corpus lost its shard partitioning (global window):\n$pp")
    // quality model: the coefficient join must not be a cartesian; the
    // weights side is dim rows and broadcast-eligible
    val pq = planOf("q_quality_model")
    assert(!pq.contains("CartesianProduct"),
      s"q_quality_model weights join went cartesian:\n$pq")
  }

  test("round-8 LM/langid queries: fused kernels carry no inferred generate filters") {
    // same InferFiltersFromGenerate trap guard as the decontaminate
    // family, for the new fused trigram-counts kernel
    val pl = planOf("q_lang_id_ngram")
    assert(!pl.contains("isnotnull(shingle_hash_counts("),
      "inferred generate filter on the trigram-counts kernel — alias-before-explode regression")
    assert(!"size\\(shingle_hash_counts\\([^)]*\\)[^\\n]*> 0".r.findFirstIn(pl).isDefined,
      "size(shingle_hash_counts) > 0 generate filter — alias-before-explode regression")
    // at most the 4-row floors broadcast rides a nested-loop join; the
    // profile join itself must stay an equi join
    assert(!pl.contains("CartesianProduct"), s"q_lang_id_ngram went cartesian:\n$pl")
    // bigram LM: the shifted-zip pair generator stays inline (no
    // per-doc window shuffle for prev-token derivation)
    val pb = planOf("q_bigram_logprob")
    assert(!pb.contains("CartesianProduct"), s"q_bigram_logprob went cartesian:\n$pb")
    // bpe tokenization is a pure projection pipeline: no joins at all
    val pt = planOf("q_bpe_tokens")
    assert(!pt.contains("Join"), s"q_bpe_tokens grew a join:\n$pt")
  }

  test("decontaminate explode branch carries no inferred shingle-kernel filter") {
    // guard against the InferFiltersFromGenerate trap (see CLAUDE.md):
    // aliasing the array to an attribute before explode gets
    // `size(arr) > 0 AND isnotnull(arr)` inferred and alias-substituted
    // back through the projection — the kernel then runs 3x per row.
    // Its plan signature is a bare isnotnull(shingle_hashes(...)) /
    // size(shingle_hashes(...)) > 0 filter; the inline form never has
    // one. (The sizes branch's isnotnull(size(...)) from join
    // constraint propagation is fine — same codegen stage, CSE'd.)
    val p = planOf("q_decontaminate")
    assert(!p.contains("isnotnull(shingle_hashes("),
      "inferred generate filter on the shingle kernel — alias-before-explode regression")
    assert(!"size\\(shingle_hashes\\([^)]*\\)[^\\n]*> 0".r.findFirstIn(p).isDefined,
      "size(shingle_hashes) > 0 generate filter — alias-before-explode regression")
    // same trap guard for the fused word-gram kernel
    val pt = planOf("q_decontaminate_tokens")
    assert(!pt.contains("isnotnull(token_shingle_hashes("),
      "inferred generate filter on the token-shingle kernel — alias-before-explode regression")
    assert(!"size\\(token_shingle_hashes\\([^)]*\\)[^\\n]*> 0".r.findFirstIn(pt).isDefined,
      "size(token_shingle_hashes) > 0 generate filter — alias-before-explode regression")
  }

  test("substring-dedup anchors compute gram hashes once per row (q_substring_dedup)") {
    // guard against the CollapseProject single-use-alias trap: if the
    // (hash, pos) sites array gets inlined into the windowed-min
    // lambda, the slice argument in the plan is the whole zip_with
    // hash pipeline and EVERY window start recomputes all gram hashes
    // — O(len²·k) per doc, measured 90 s vs 1.7 s at sf0.01. The
    // multi-reference block keeps the slice on the __sites attribute.
    for (q <- Seq("q_substring_dedup", "q_substring_strip")) {
      val p = planOf(q)
      assert(!p.contains("slice(zip_with("),
        s"$q re-inlined the sites array into the window lambda:\n${p.take(4000)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q candidate pairing degraded to a quadratic join")
    }
  }

  test("hash-order family: chunk-partitioned windows, never a global sort (q_hash_rank, q_token_budget)") {
    // the whole point of the chunked-prefix machinery is that no stage
    // single-partitions the corpus; the final orderBy in the query is
    // a result presentation sort and compiles to a range exchange
    for (q <- Seq("q_hash_rank", "q_token_budget")) {
      val p = planOf(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q lost its chunk partitioning (global window):\n$p")
    }
    // per-key budget: exactly the one window exchange on the key
    val pk = planOf("q_token_budget_key")
    assert(!pk.contains("Exchange SinglePartition"),
      s"q_token_budget_key single-partitioned:\n$pk")
    // interleave ranks per (source, chunk); domain cap windows per key
    // — neither may collapse to a single partition
    for (q <- Seq("q_interleave", "q_domain_cap")) {
      val p = planOf(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q single-partitioned:\n$p")
    }
  }

  test("domain family: pure columnar filter / one keyed aggregation (q_domain_filter, q_domain_stats)") {
    val pf = planOf("q_domain_filter")
    assert(!pf.contains("Join"), s"q_domain_filter grew a join (literal blocklist is columnar):\n$pf")
    val ps = planOf("q_domain_stats")
    // map-side partial aggregation before the exchange
    assert(ps.contains("HashAggregate"), s"q_domain_stats lost hash aggregation:\n$ps")
    assert(!ps.contains("CartesianProduct") && !ps.contains("Join"),
      s"q_domain_stats grew a join:\n$ps")
  }

  test("weighted sample compiles to TakeOrdered, not a global sort (q_weighted_sample)") {
    val p = planOf("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted draw lost its per-partition top-k shape:\n$p")
  }

  test("CDC family: kernelized cuts, hash-keyed counts, no single partition") {
    for (q <- Seq("q_cdc_chunks", "q_cdc_dups", "q_cdc_strip")) {
      val p = planOf(q)
      assert(p.contains("cdc_cuts"), s"$q lost the CdcCuts kernel:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("Exchange SinglePartition"),
        s"$q grew a quadratic/single-partition stage:\n$p")
    }
    // the strip's corpus count aggregates on the xxhash64 chunk key
    val ps = planOf("q_cdc_strip")
    assert(ps.contains("xxhash64"), s"q_cdc_strip count key is not the hash:\n$ps")
  }

  test("curation v3 composite: no cartesian, no single-partition stage (q_curation_v3)") {
    val p = planOf("q_curation_v3")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_curation_v3 went quadratic:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q_curation_v3 single-partitioned:\n$p")
    // the DSIR stage must stay a literal lookup even inside the chain
    assert(!p.contains("Join"), s"q_curation_v3 grew a join:\n$p")
  }

  test("DSIR scoring pass is map-side: literal lookup, no joins (q_dsir_score)") {
    // the fit is two separate tiny count jobs at build time; the
    // returned scoring plan must be a pure projection — the model
    // rides as a literal array, so the 100 TB scoring pass has zero
    // joins and only the final orderBy exchange
    val p = planOf("q_dsir_score")
    assert(!p.contains("Join"), s"DSIR scoring grew a join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"DSIR scoring grew a hash exchange:\n$p")
  }

  test("SQ8 ADC scan: query side broadcasts, corpus never exchanges before top-k (q_ann_sq8)") {
    val p = planOf("q_ann_sq8")
    // broadcast nested-loop on the (small-by-contract) query set — the
    // same shape as bruteForceTopK; the corpus side must not hash-
    // exchange until the per-query rank window
    assert(p.contains("BroadcastNestedLoopJoin"), s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"SQ8 scan went cartesian:\n$p")
    // the only hash exchange is the q_id rank window (bounds fit is a
    // separate tiny job, not part of this plan)
    assert("Exchange hashpartitioning\\(q_id".r.findAllIn(p).nonEmpty,
      s"missing the per-query top-k window exchange:\n$p")
  }

  test("round-9 projection-tier queries carry no hash exchange (q_html_text, q_gopher_signals)") {
    // both are pure per-row work — the only exchange either may carry
    // is the final orderBy's range partitioning
    for (q <- Seq("q_html_text", "q_gopher_signals")) {
      val p = planOf(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q grew a hash exchange:\n$p")
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
    }
  }

  test("expectationsReport is ONE aggregate pass (single hash exchange, no join)") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = graft.functions.Corpus.expectationsReport(li,
        notNull = Seq("l_returnflag"),
        uniqueKeys = Seq(Seq("l_orderkey", "l_linenumber")),
        ranges = Seq(("l_quantity", 1.0, 25.0)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"report grew a join:\n$p")
    // ONE scan of the data; the uniqueness rule's distinct-aggregate
    // rewrite adds exactly one keyed exchange (partial-aggregated on
    // the key before it), nothing more
    assert("FileScan".r.findAllIn(p).size == 1, s"report re-scanned the data:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"report hash-exchanged beyond the distinct rewrite:\n$p")
    // without a uniqueness rule the report is conditional sums only —
    // zero hash exchanges
    val p2 = graft.functions.Corpus.expectationsReport(li,
        notNull = Seq("l_returnflag"),
        ranges = Seq(("l_quantity", 1.0, 25.0)))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p2).isEmpty &&
      !p2.contains("Join"), s"sum-only report grew shuffles:\n$p2")
  }

  test("symmetric-margin exact tier never single-partitions on the constant cluster key (q_ann_margin_sym)") {
    val p = planOf("q_ann_margin_sym")
    // the kLists=1 self-scan must be a (broadcast) nested-loop /
    // cartesian over partitions, not a hash join on lit(1)
    assert(!p.contains("Exchange hashpartitioning(1"),
      s"self-scan hashed every row to one partition:\n$p")
    assert(!p.contains("__cl"), s"constant cluster key leaked into the plan:\n$p")
  }

  test("dup-n-gram coverage aggregates on narrow keys, no cartesian (q_dup_ngram)") {
    val p = planOf("q_dup_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q_dup_ngram went all-pairs:\n$p")
    // equi-joins only (position length join-back + the left joins)
    assert(p.contains("Join") || p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"))
  }

  test("round-11 shapes: guarded broadcasts, chunked windows, equi-joins only") {
    // k-core: per-round guard joins EXECUTE during the loop's
    // materializations (they can't appear in the returned plan — it
    // reads the final materialized edge set; the broadcast-vs-shuffled
    // equality is behaviorally spec'd in CorpusSpec). The returned
    // plan must stay the bare degree aggregate: no joins at all.
    val pk = planOf("q_kcore")
    assert(!pk.contains("SortMergeJoin") && !pk.contains("CartesianProduct")
      && pk.contains("graft-materialized"),
      s"q_kcore output plan grew unexpected operators:\n${pk.take(3000)}")
    // triangles (intersect default): adjacency sides broadcast under
    // the cap and the contrib generator stays a Generate over the
    // inline kernel — never a wedge SortMergeJoin
    val pt = planOf("q_triangles")
    assert(pt.contains("BroadcastHashJoin") && pt.contains("Generate"),
      s"q_triangles lost the broadcast-adjacency intersect shape:\n${pt.take(3000)}")
    assert(pt.contains("triangle_contrib"), "contrib kernel not inline")
    // exact quantiles: the selection window is PARTITIONED by the
    // value-range chunk (never a single-partition global sort of the
    // data; the final 5-row orderBy is the only global sort)
    val pq = planOf("q_quantiles")
    assert(pq.contains("__chunk"), s"q_quantiles lost the chunked window:\n${pq.take(3000)}")
    // media near-dup: pairing is the pigeonhole EQUI-join — no
    // cartesian/theta anywhere (the aHash projection itself sits
    // behind the fingerprint materialization, like every simhash fp)
    val pm = planOf("q_media_neardup")
    assert(!pm.contains("CartesianProduct") && !pm.contains("BroadcastNestedLoopJoin"),
      s"q_media_neardup went all-pairs:\n${pm.take(3000)}")
    assert(pm.contains("Join"), "pigeonhole equi-join missing")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Relational}
import graft.sources.Tables

/** Plan-shape assertions — the scale contract of SURVEY.md §5 encoded
  * as tests: pruned scans, pushed filters, broadcast dims, bounded
  * corpus passes. These fail if a refactor silently regresses the
  * physical plan even when results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planString(df: DataFrame): String = {
    df.collect() // force AQE to finalize
    // keep only the final adaptive plan, not the "Initial Plan" echo
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("multi-join: dims broadcast, lineitem scan pruned to 3 columns") {
    val p = planString(Relational.revenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    // the ASIA restriction must hit customer BEFORE any fact join — a
    // broadcast LEFT SEMI on the handful of ASIA nation keys; without
    // it ~80% of customers (and their orders/lineitem rows) ride the
    // fact shuffles just to be discarded at the end
    assert(p.contains("LeftSemi"),
      "customer side not pre-restricted by an ASIA semi-join")
    val lineitemScan = p.linesIterator.find(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScan.isDefined)
    assert(lineitemScan.get.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      s"lineitem scan not pruned: ${lineitemScan.get}")
  }

  test("agg: shipdate filter pushed to the parquet scan") {
    val p = planString(Relational.pricingSummary(Tables.lineitem(spark, sf)))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "shipdate predicate not pushed to scan")
  }

  test("bm25Score: exactly 2 corpus scans and a reused exchange") {
    val p = planString(Bm25.bm25Score(Tables.documents(spark, sf)))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans == 2, s"expected 2 corpus passes, plan has $scans")
    assert(p.contains("ReusedExchange"), "dl exchange not reused by the stats branch")
  }

  test("batchSearch: still exactly 2 corpus scans for a whole query table") {
    import spark.implicits._
    val queries = Bm25.DemoQueries.toDF("query_id", "qtext")
    val p = planString(Bm25.batchSearch(Tables.documents(spark, sf), queries))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans == 2, s"expected 2 corpus passes regardless of query count, plan has $scans")
  }

  test("minhash signatures: zero shuffles (pure map stage)") {
    val df = graft.operators.Dedup.minhashSignatures(Tables.documents(spark, sf))
    df.collect()
    val exec = df.queryExecution.executedPlan
    def countExchanges(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: Exchange => 1
        case a: AdaptiveSparkPlanExec => countExchanges(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(countExchanges).sum
    }
    assert(countExchanges(exec) == 0, s"signature computation should not shuffle:\n$exec")
  }

  test("topK per group: WindowGroupLimit bounds each group before the shuffle") {
    val p = planString(Bm25.topKTerms(Tables.documents(spark, sf)))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "rank-limit pushdown (partial WindowGroupLimit) missing")
  }

  test("topN: global sort is TakeOrdered, not a full sort") {
    val p = planString(Relational.topOrders(Tables.orders(spark, sf)))
    assert(p.contains("TakeOrderedAndProject"), "top-N should not global-sort")
  }

  test("range join: binning makes it a broadcast HASH join, not nested-loop") {
    val p = planString(Relational.priceBandJoin(Tables.lineitem(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), s"expected equi-join on bucket:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval predicate must be a residual filter, not the join condition")
  }

  test("two-role nation join: all four dims broadcast, one fact-fact shuffle") {
    // pre-execution plan (no collect): at tiny sf the pair filter
    // matches nothing and AQE collapses the FINAL plan to EmptyRelation
    val p = Relational.nationVolume(spark, sf).queryExecution.executedPlan.toString
    // the four dims (supplier, customer, nation in both roles) must be
    // broadcast builds; at this sf orders broadcasts too, hence >= 4
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"supplier/customer/nation(x2) should broadcast:\n$p")
    assert(p.contains("sn_key") && p.contains("cn_key"),
      "both nation roles must join independently")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("Q5 shape: every dim broadcast, returnflag filter pushed in Q10") {
    val p5 = planString(Relational.localSupplierVolume(spark, sf))
    assert(!p5.contains("BroadcastNestedLoopJoin") && !p5.contains("CartesianProduct"))
    assert(p5.split("BroadcastHashJoin").length - 1 >= 4,
      s"supplier/customer/nation/region should broadcast:\n$p5")
    val p10 = planString(Relational.returnedItemReporting(spark, sf))
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed to the lineitem scan:\n$p10")
  }

  test("phrase search: doc-local equi-joins, never a nested loop") {
    val docs = Tables.documents(spark, sf)
    val p = planString(graft.operators.Positional.phraseSearch(docs))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"phrase join degenerated to a nested loop:\n$p")
  }

  test("BM25F: one corpus scan feeds weighted tf, dl and df") {
    val docs = Tables.documents(spark, sf)
    val p = planString(graft.operators.Positional.bm25fScore(docs))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans <= 2, s"BM25F should need at most 2 corpus scans, saw $scans:\n$p")
  }

  test("bloom semi-join: the might-contain prefilter sits UNDER the join") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val keys = Tables.orders(spark, sf).filter(col("o_totalprice") > 200000.0)
      .select("o_orderkey")
    val df = graft.operators.Skew.bloomSemiJoin(li, keys, "l_orderkey", "o_orderkey")
    val p = planString(df)
    // parents print first: the UDF prefilter must appear BELOW (after)
    // the LeftSemi join line, on the probe side
    val joinIdx = p.indexOf("LeftSemi")
    val filterIdx = p.indexOf("UDF(")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom prefilter should be below the semi join:\n$p")
  }

  test("Q6: all three predicates pushed to the lineitem scan") {
    val p = planString(graft.operators.TpcH.revenueForecast(spark, sf))
    // the PushedFilters list prints truncated — assert its prefix plus
    // the full Filter condition carrying all three predicates
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"Q6 predicates not pushed to the scan:\n$p")
    assert(p.contains(">= 1997-01-01") && p.contains("l_discount#") && p.contains("< 24.0"),
      s"Q6 filter does not carry all three predicates:\n$p")
  }

  test("Q19: disjunctive predicate stays a broadcast HASH join") {
    val p = planString(graft.operators.TpcH.disjunctiveRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected partkey equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "OR-of-ANDs must not degrade the join to a nested loop")
  }

  test("Q21: both correlations are semi/anti joins, no cartesian work") {
    val p = planString(graft.operators.TpcH.waitingOrders(spark, sf))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS should lower to semi+anti joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q21:\n$p")
  }

  test("Q2 shape: dims broadcast, rank-1 filter bounds groups before shuffle") {
    val p = planString(graft.operators.TpcH.minCostSupplier(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"supplier/part dims should broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank()=1 should push a group limit under the window sort:\n$p")
  }

  test("bucketed join: no exchange on either join side") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    df.collect()
    // QueryStageExec nodes are LEAVES that hide their subtree in
    // .plan — unwrap them or the traversal stops at the agg shuffle
    def kids(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def findJoin(p: org.apache.spark.sql.execution.SparkPlan): Option[org.apache.spark.sql.execution.SparkPlan] = p match {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Some(j)
      case other => kids(other).view.flatMap(findJoin).headOption
    }
    def hasExchange(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[Exchange] || kids(p).exists(hasExchange)
    val join = findJoin(df.queryExecution.executedPlan)
    assert(join.isDefined, s"expected a sort-merge join:\n${df.queryExecution.executedPlan}")
    assert(!join.get.children.exists(hasExchange),
      s"bucketed tables must join without exchanges:\n${join.get}")
  }

  test("kNN: the small test split is the broadcast side") {
    val emb = Tables.embeddings(spark, sf)
    val p = planString(graft.operators.Vectors.knnClassify(emb))
    assert(p.contains("BroadcastNestedLoopJoin"), // non-equi pair join: NLJ by design
      s"expected a broadcast nested-loop pair join:\n$p")
    // the broadcast exchange must carry the vec_id % 10 = 0 TEST side
    val bIdx = p.indexOf("BroadcastExchange")
    assert(bIdx >= 0 && p.indexOf("% 10) = 0", bIdx) >= 0,
      s"test split should be the broadcast build side:\n$p")
  }

  test("boolean search: term prune reaches the tokenize stage, one doc_id aggregation tree") {
    val p = planString(graft.operators.SearchExtras.booleanSearch(Tables.documents(spark, sf)))
    // the isin prune must sit directly on the exploded terms (one scan)
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"boolean search must be a single corpus pass, got $scans")
    assert(p.contains("term#") && p.contains("IN (spark,query,join,merge,slow)"),
      s"query-term prune not applied before aggregation:\n$p")
  }

  test("hamming ANN: exactly 2 corpus-sized scans (signatures + rerank), candidates TakeOrdered") {
    val emb = Tables.embeddings(spark, sf)
    val p = planString(graft.operators.Ann.hammingTopK(emb))
    // corpus-sized scans exclude the pushed-down single-row query lookups
    val corpusScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("embeddings") && l.contains("Not(EqualTo(vec_id,0))"))
    assert(corpusScans == 2, s"expected 2 corpus-sized scans, got $corpusScans:\n$p")
    assert(p.contains("TakeOrderedAndProject(limit=100"),
      s"candidate selection should be a bounded TakeOrdered:\n$p")
  }

  test("PQ ANN: encode+ADC is a map stage, candidates TakeOrdered, no codebook shuffle") {
    val emb = Tables.embeddings(spark, sf)
    val p = planString(graft.operators.Ann.pqTopK(emb))
    // candidate selection bounded before any join
    assert(p.contains("TakeOrderedAndProject(limit=100"),
      s"ADC candidate selection should be a bounded TakeOrdered:\n$p")
    // codebooks and the ADC table ride as plan literals: the ONLY
    // exchanges allowed are the broadcast of the single query row and
    // of the bounded candidate set — never a hash/range repartition of
    // the encoded corpus
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    assert(shuffles == 0, s"PQ scoring must not shuffle the corpus:\n$p")
  }

  test("IVF+PQ ANN: residual encode is a map stage, no corpus shuffle") {
    // the residual attach must come from the transform output's own
    // features column — a vec_id re-join of the corpus would shuffle
    // the whole encode stage (mirrors the pqTopK zero-shuffle pin)
    val p = planString(graft.operators.Ann.ivfPqTopK(Tables.embeddings(spark, sf)))
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    assert(shuffles == 0, s"IVF+PQ scoring must not shuffle the corpus:\n$p")
  }

  test("staged PQ serving: zero corpus shuffles, candidates TakeOrdered") {
    val idx = java.nio.file.Files.createTempDirectory("pqsrv").toString + "/index"
    graft.operators.PqIndex.build(Tables.embeddings(spark, sf), idx)
    val p = planString(graft.operators.PqIndex.searchTopK(spark, idx))
    assert(p.contains("TakeOrderedAndProject(limit=100"),
      s"ADC candidate selection should be a bounded TakeOrdered:\n$p")
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    assert(shuffles == 0, s"staged PQ serving must not shuffle the corpus:\n$p")
  }

  test("seq chunks: zero exchanges (pure map+explode)") {
    val df = graft.operators.TextAnalysis.seqChunks(Tables.documents(spark, sf))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("plan hygiene: no wired query plans a partition-less window") {
    // A Window (or WindowGroupLimit) with an empty partitionSpec moves
    // its ENTIRE input to one partition — Spark's "No Partition
    // Defined" warning, and a single-executor chokepoint at 100 TB.
    // Every rank-for-top-N in the engine routes through the window-free
    // TopK.rankedTopN instead, so the whole wired surface must plan
    // ZERO of them. Logical-plan level: cheap (no execution) and
    // independent of AQE re-planning.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit => LWgl}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.getClass.getSimpleName
        case w: LWgl if w.partitionSpec.isEmpty => w.getClass.getSimpleName
      }
      if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"partition-less windows in wired plans:\n${offenders.mkString("\n")}")
  }

  test("per-group top-k ranks are WindowGroupLimit-pruned (hard negatives, class tfidf)") {
    // rank-filter top-k per group must trigger InferWindowGroupLimit:
    // each map partition keeps only k rows per group BEFORE the
    // shuffle, so the per-group window never concentrates a
    // corpus-sized relation on one partition
    val hn = planString(graft.operators.Ann.hardNegatives(Tables.embeddings(spark, sf)))
    assert(hn.contains("WindowGroupLimit"),
      s"hardNegatives rank filter not group-limit pruned:\n$hn")
    val ct = planString(graft.operators.TextAnalysis.classTfIdf(Tables.documents(spark, sf)))
    assert(ct.contains("WindowGroupLimit"),
      s"classTfIdf rank filter not group-limit pruned:\n$ct")
  }

  test("rfm: orders scanned once (checkpointed customer aggregate feeds both consumers)") {
    val p = planString(graft.operators.Relational.rfmSegments(Tables.orders(spark, sf)))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("orders"))
    assert(scans == 0, s"post-checkpoint plan must not rescan orders, got $scans:\n$p")
  }

  test("spell correct: pruned signature equi-join, corpus scanned once") {
    val p = planString(graft.operators.SearchExtras.spellCorrect(Tables.documents(spark, sf)))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"spell correction must scan the corpus once, got $scans")
    // the candidate join must be a HASH join on the delete-variant
    // signature (query variants broadcast), not a nested-loop
    // levenshtein over the whole vocabulary
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"candidate join should be an equi join on sig:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("sig"),
      s"expected a broadcast hash join keyed on sig:\n$p")
    // the length band reaches the vocabulary side before the explode
    assert(p.contains("length(term"), s"length band missing from vocab side:\n$p")
  }

  test("interval join: overlap runs as a bin equi-join, never a nested loop") {
    val p = planString(Relational.intervalJoin(Tables.events(spark, sf)))
    // the session↔window join must be a HASH join keyed on the hour
    // bin (the overlap predicate demoted to a join residual); the only
    // nested-loop allowed is the 1-row broadcast of the avg threshold
    assert(p.contains("BroadcastHashJoin [hour") || p.contains("SortMergeJoin [hour"),
      s"interval overlap must equi-join on the time bin:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in interval join:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"only the scalar-threshold broadcast may nested-loop, got $bnlj:\n$p")
  }

  test("mips: scan-shaped plan — broadcast query, TakeOrdered, no hash exchange") {
    val p = planString(graft.operators.Ann.mipsTopK(Tables.embeddings(spark, sf)))
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"MIPS scan must not shuffle the corpus:\n$p")
  }

  test("heaps law: no window, no sort — conditional aggregates only") {
    val df = graft.operators.TextAnalysis.heapsLaw(Tables.documents(spark, sf))
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Sort => LSort}
    val bad = plan.collect {
      case w: LWindow => w.getClass.getSimpleName
      case s: LSort => s.getClass.getSimpleName
    }
    assert(bad.isEmpty, s"heaps law must be pure aggregation, found: $bad")
  }

  test("cms heavy hitters: no term-keyed exchange feeds the counter fold") {
    val p = planString(graft.operators.Sketches.heavyHitters(Tables.documents(spark, sf)))
    // the counter aggregation exchanges on (r, bucket) — sketch-sized
    // keys; the only term exchange allowed is the distinct-term
    // pricing side
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.exists(_.contains("bucket")),
      s"counter fold must shuffle on (r, bucket):\n$p")
  }

  test("filtered ANN: label predicate pushed to the embeddings scan, TakeOrdered ranking") {
    val p = planString(graft.operators.Ann.filteredTopK(Tables.embeddings(spark, sf)))
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)")
      || p.contains("EqualTo(label,3)"),
      s"label predicate not pushed to the scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$p")
  }

  test("rolling median: window-free explode-contribution plan") {
    val df = Relational.rollingMedian(Tables.orders(spark, sf))
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = plan.collect { case w: LWindow => w }
    assert(wins.isEmpty, "rolling median must not plan a window (global-sort trap)")
  }

  test("rouge pairs: the tf join is pair-driven (no tf-tf self-join on term alone)") {
    // the verify-join lesson encoded: the second tf join must carry
    // doc_b in its key so cost is pair-scaled, never co-token-squared
    import spark.implicits._
    val docs = Seq((1L, "a1 b1"), (2L, "a1 c1")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val p = planString(graft.operators.TextAnalysis.rouge1Pairs(docs, pairs))
    val joinKeys = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq ++
      p.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq ++
      p.linesIterator.filter(_.contains("ShuffledHashJoin")).toSeq
    assert(joinKeys.exists(l => l.contains("doc_b") && l.contains("term")),
      s"tf-tf join must be keyed on (doc_b, term):\n$p")
  }
}

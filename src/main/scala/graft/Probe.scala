package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lineage._
object Probe {
  /** Shared timing/print helper for every probe mode. */
  private def timed(prefix: String)(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$prefix $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  /** `copies`× replication of `df` with every key in `keys` offset per
    * copy (keeps joins resolvable while multiplying the fact side). */
  private def replicate(df: DataFrame, keys: Seq[String],
                        copies: Int, offset: Long): DataFrame =
    (0 until copies).map { i =>
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * offset)))
    }.reduce(_ unionByName _).repartition(32)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    if (args.headOption.contains("spell")) {
      // SymSpell-at-scale probe: the delete-neighborhood equi-join is
      // motivated by web-scale vocabularies — at sf0.1's 31-term vocab
      // it costs MORE than a nested loop (documented trade, SURVEY
      // §14). This probe builds a 10k-term synthetic vocabulary and
      // times the shipped join against the nested-loop levenshtein
      // baseline it replaced, showing where the curve crosses.
      import spark.implicits._
      val syl = Array("ka", "ri", "to", "ve", "mu", "sa", "ne", "lo", "pi", "du", "ga", "che")
      def word(i: Int): String = {
        var x = i; val sb = new StringBuilder
        (0 until 4).foreach { _ => sb.append(syl(x % syl.length)); x /= syl.length }
        sb.toString
      }
      val vocabTerms = (0 until 20736).map(word).distinct
      // 1000 misspelled queries: deterministic typo per source word
      // (drop a char / substitute first char / append) — the realistic
      // did-you-mean batch a search frontend sends
      val nQ = sys.env.getOrElse("SPARK_GRAFT_SPELL_NQ", "1000").toInt
      val queries = (0 until nQ).map { i =>
        val w = word(i * 17 % vocabTerms.size)
        (i % 3: @unchecked) match {
          case 0 => w.substring(0, i % w.length) + w.substring(i % w.length + 1)
          case 1 => ('z' +: w.tail).mkString
          case 2 => w + "x"
        }
      }.distinct
      println(s"SPELL vocab=${vocabTerms.size} terms, queries=${queries.size}")
      val docs = vocabTerms.grouped(100).zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      docs.cache().count()
      // warmup: codegen + first-job costs land here, not in a timing
      graft.operators.SearchExtras.spellCorrect(docs, Seq("kari"), k = 1).count()
      timed("SPELL")("symspell_join")(
        graft.operators.SearchExtras.spellCorrect(docs, queries).count())
      // the replaced nested loop: levenshtein against EVERY (q, term)
      // pair — vocab×queries evaluations, no candidate pruning
      val vocab = graft.operators.Bm25.tokenize(docs)
        .groupBy("term").agg(count(lit(1)).as("n")).cache()
      vocab.count()
      val q = queries.toDF("q")
      timed("SPELL")("crossjoin_baseline")(
        vocab.crossJoin(broadcast(q))
          .filter(levenshtein(col("q"), col("term")) <= 2).count())
      spark.stop(); return
    }
    if (args.headOption.contains("scale")) {
      // 20x corpus: 100k docs incl. 20 exact copies of each (worst-case
      // dup skew), 40k vectors
      replicate(graft.sources.Tables.documents(spark, dir), Seq("doc_id"), 20, 10000L)
        .write.mode("overwrite").parquet("/tmp/scale/documents.parquet")
      replicate(graft.sources.Tables.embeddings(spark, dir), Seq("vec_id"), 20, 10000L)
        .write.mode("overwrite").parquet("/tmp/scale/embeddings.parquet")
      val d = spark.read.parquet("/tmp/scale/documents.parquet")
      val e = spark.read.parquet("/tmp/scale/embeddings.parquet")
      // optional second arg = comma-separated substring filters for
      // targeted re-timing
      val keep: String => Boolean =
        args.drop(1).headOption
          .map(f => (n: String) => f.split(",").exists(n.contains))
          .getOrElse(_ => true)
      def time(name: String)(f: => Long): Unit =
        if (keep(name)) timed("SCALE")(name)(f)
      time("count")(d.count() + e.count())
      time("tf")(graft.operators.Bm25.tf(d).count())
      time("bm25_score")(graft.operators.Bm25.bm25Score(d).count())
      time("bm25_ml")(graft.operators.MlPipeline.bm25Score(d).count())
      time("dedup_exact")(graft.operators.Dedup.exact(d).count())
      time("dedup_minhash")(graft.operators.Dedup.minhashCandidates(d).count())
      time("simhash_pairs")(graft.operators.Dedup.simhashPairs(d).count())
      time("ann_lsh")(graft.operators.Ann.lshTopK(e).count())
      time("ann_ivf")(graft.operators.Ann.ivfTopK(e).count())
      time("dedup_drop")(graft.operators.Dedup.dropDuplicates(d).count())
      time("dedup_clusters")(graft.operators.Dedup.nearDupClusters(d).count())
      time("dedup_keep_best")(graft.operators.Dedup.keepBest(d).count())
      time("batch_search") {
        import spark.implicits._
        graft.operators.Bm25.batchSearch(d,
          graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).count()
      }
      time("contamination")(graft.operators.TextAnalysis.contamination(
        d.filter(col("doc_id") % 97 =!= 0),
        d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("probe_id"), col("text"))).count())
      // span dedup worst case under 20x replication: EVERY window is
      // cross-doc duplicated, so the dup-span set is maximal
      time("dedup_spans")(graft.operators.Dedup.dupSpans(d).count())
      time("span_flag")(graft.operators.Dedup.spanFlags(d).count())
      time("span_scrub")(graft.operators.Dedup.scrubSpans(d).count())
      time("gopher_rep")(graft.operators.TextAnalysis.gopherRepetition(d).count())
      time("contamination_fuzzy")(graft.operators.Dedup.fuzzyContamination(
        d.filter(col("doc_id") % 5 =!= 0),
        d.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("probe_id"), col("text"))).count())
      time("hybrid_rrf")(graft.operators.Hybrid.rrfSearch(d, e).count())
      time("wordcount")(graft.operators.Bm25.tokenize(d)
        .groupBy("term").agg(count(lit(1)).as("n")).count())
      time("wordcount_salted")(graft.operators.Skew.saltedWordCount(d).count())
      time("char_trigrams")(graft.operators.TextAnalysis.charTrigrams(d).count())
      time("pmi")(graft.operators.TextAnalysis.bigramPmi(d).count())
      time("zipf")(graft.operators.TextAnalysis.zipfProfile(d).count())
      time("stem")(graft.operators.TextAnalysis.stemmedVocab(d).count())
      time("index_incremental") {
        val p = "/tmp/scale/idx"
        graft.operators.Bm25Index.build(d.filter(col("doc_id") % 5 =!= 0), p)
        graft.operators.Bm25Index.update(d.filter(col("doc_id") % 5 === 0), p)
        graft.operators.Bm25Index.score(spark, p).count()
      }
      time("positions")(graft.operators.Positional.positionalPostings(d).count())
      time("phrase")(graft.operators.Positional.phraseSearch(d).count())
      time("bm25f")(graft.operators.Positional.bm25fScore(d).count())
      time("prf_search")(graft.operators.Positional.expandedSearch(d).count())
      time("index_batch_search") {
        import spark.implicits._
        graft.operators.Bm25Index.batchSearch(spark, "/tmp/scale/idx",
          graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).count()
      }
      time("gopher")(graft.operators.TextAnalysis.gopherRules(d).count())
      time("heavy_hitters")(graft.operators.Sketches.heavyHitters(d).count())
      time("emb_outliers")(graft.operators.Vectors.centroidOutliers(e).count())
      time("knn_brute")(graft.operators.Vectors.knnClassify(e).count())
      time("knn_ivf")(graft.operators.Vectors.knnClassifyIvf(e).count())
      // the production semantic-dedup point: high threshold, 12-bit
      // buckets (4k buckets/table shrink candidate volume; the gate's
      // 24x4 recall-floor config is for the low-threshold band)
      time("dedup_embcos_lsh")(graft.operators.Ann.lshCosinePairs(
        e, threshold = 0.8, numTables = 32, bitsPerTable = 12).count())
      time("tokenize_pos")(graft.operators.Bm25.tokenizePos(d).count())
      time("keywords")(graft.operators.TextAnalysis.keywords(d).count())
      time("bigram_lm")(graft.operators.TextAnalysis.bigramLm(d).count())
      time("entropy")(graft.operators.TextAnalysis.tokenEntropy(d).count())
      time("emb_quantize")(graft.operators.Vectors.quantizeInt8(e).count())
      time("lm_dirichlet")(graft.operators.SearchExtras.lmDirichletScore(d).count())
      time("snippets")(graft.operators.SearchExtras.snippets(d).count())
      time("autocomplete")(graft.operators.SearchExtras.autocomplete(d).count())
      time("maxscore")(graft.operators.SearchExtras.maxScoreTopN(d).count())
      time("boolean_search")(graft.operators.SearchExtras.booleanSearch(d).count())
      time("spell_correct")(graft.operators.SearchExtras.spellCorrect(d).count())
      time("proximity")(graft.operators.SearchExtras.proximityTopN(d).count())
      time("facets")(graft.operators.SearchExtras.facets(d).count())
      time("ann_hamming")(graft.operators.Ann.hammingTopK(e).count())
      time("ann_batch")(graft.operators.Ann.batchTopK(e).count())
      time("seq_chunks")(graft.operators.TextAnalysis.seqChunks(d).count())
      time("seq_pack")(graft.operators.TextAnalysis.packSequences(d).count())
      time("emb_project")(graft.operators.Vectors.projectSigns(e).count())
      time("kmeans")(graft.operators.Clustering.kmeans(e).count())
      time("cluster_sample")(graft.operators.Clustering.clusterSample(e).count())
      // 20 exact copies of every vector is this operator's worst case:
      // the value collapse must absorb the 400x pair blowup
      time("semantic_clusters")(graft.operators.Clustering.semanticClusters(e).count())
      time("semantic_drop")(graft.operators.Clustering.semanticDrop(e).count())
      // round-9 operators under the same 20x dup-skew corpus
      time("dedup_verified")(graft.operators.Dedup.verifiedNearDups(d).count())
      time("pagerank")(graft.operators.Graph.pagerank(d).count())
      time("dedup_containment")(graft.operators.Dedup.containmentPairs(d).count())
      time("chunk_dups")(graft.operators.Dedup.chunkDups(d).count())
      time("bpe_pairs")(graft.operators.Bpe.pairCounts(d).count())
      time("bpe_encode")(graft.operators.Bpe.encodeCorpus(d).count())
      time("doc_perplexity")(graft.operators.TextAnalysis.docPerplexity(d).count())
      time("importance_weights")(graft.operators.TextAnalysis.importanceWeights(d).count())
      time("temperature_mix")(graft.operators.TextAnalysis.temperatureMix(d).count())
      time("stratified_sample")(graft.operators.TextAnalysis.stratifiedSample(d).count())
      time("crossval_folds")(graft.operators.TextAnalysis.crossvalFolds(d).count())
      time("html_strip")(graft.operators.TextAnalysis.stripMarkup(d).count())
      time("array_stats")(graft.operators.TextAnalysis.tokenLengthStats(d).count())
      time("string_agg")(graft.operators.Relational.docListBySource(d).count())
      time("ann_range")(graft.operators.Ann.rangeSearch(e).count())
      // round-9c operators: 20 exact copies of every doc is the
      // containment/dup-rate worst case (value collapse must hold);
      // 20x vectors stress the per-query rank pruning
      time("dedup_contained_drop")(graft.operators.Dedup.dropContained(d).count())
      time("dup_rate_by_source")(graft.operators.Dedup.dupRateBySource(d).count())
      time("class_tfidf")(graft.operators.TextAnalysis.classTfIdf(d).count())
      time("quality_percentile")(graft.operators.TextAnalysis.qualityPercentile(d).count())
      time("pipeline_funnel")(graft.operators.TextAnalysis.pipelineFunnel(d).count())
      time("multimodal_dedup")(graft.operators.Multimodal.dedupBlobs(d).count())
      time("hard_negatives")(graft.operators.Ann.hardNegatives(e).count())
      time("mmr")(graft.operators.Ann.mmrTopK(e).count())
      time("corpus_diff") {
        val v1 = d.filter(col("doc_id") % 7 =!= 3)
        val v2 = d.filter(col("doc_id") % 11 =!= 5)
          .withColumn("text", when(col("doc_id") % 13 === 2,
            concat(col("text"), lit(" vmark"))).otherwise(col("text")))
        graft.operators.Relational.corpusDiff(v1, v2).count()
      }
      // events replicated 20x on (event_id, user_id) with the SAME 100
      // items — every item becomes 20x hotter, the bipartite-CC and
      // transition shapes' worst skew
      val ev = replicate(graft.sources.Tables.events(spark, dir),
        Seq("event_id", "user_id"), 20, 10000000L)
      ev.write.mode("overwrite").parquet("/tmp/scale/events.parquet")
      val evr = spark.read.parquet("/tmp/scale/events.parquet")
      time("graph_cc")(graft.operators.Graph.userCommunities(evr).count())
      time("event_transitions")(graft.operators.Relational.eventTransitions(evr).count())
      time("range_frame")(graft.operators.Relational.slidingHourStats(evr).count())
      time("active_intervals")(graft.operators.Relational.activeIntervals(evr).count())
      time("first_touch")(graft.operators.Relational.firstTouch(evr).count())
      time("cdc_apply")(graft.operators.Relational.cdcApply(evr).count())
      time("k_anonymize")(graft.operators.Relational.kAnonymize(evr).count())
      // round-9e operators under the same 20x skew: the graph pair
      // (triangles/link-prediction) sees 20-copy cliques — the wedge
      // joins must survive the cubic per-clique blowup the exact
      // collapse bounds; minhash_est and lsh_tune re-band the skewed
      // corpus; cep/interval/mad ride the 20x-hot event log
      time("triangles")(graft.operators.Graph.triangles(d).count())
      time("common_neighbors")(graft.operators.Graph.commonNeighbors(d).count())
      time("minhash_est")(graft.operators.Dedup.minhashEstimate(d).count())
      time("lsh_tune")(graft.operators.Dedup.lshTune(d).count())
      time("ks_drift")(graft.operators.TextAnalysis.ksDrift(d).count())
      time("heaps_law")(graft.operators.TextAnalysis.heapsLaw(d).count())
      time("readability")(graft.operators.TextAnalysis.readability(d).count())
      time("kn_bigram")(graft.operators.TextAnalysis.knBigram(d).count())
      time("log_odds")(graft.operators.TextAnalysis.logOdds(d).count())
      time("bpe_fertility")(graft.operators.Bpe.fertility(d).count())
      time("mips")(graft.operators.Ann.mipsTopK(e).count())
      time("cep_match")(graft.operators.Relational.cepMatch(evr).count())
      time("interval_union")(graft.operators.Relational.intervalUnion(evr).count())
      time("interval_join")(graft.operators.Relational.intervalJoin(evr).count())
      time("mad_outliers")(graft.operators.Relational.madOutliers(evr).count())
      time("changepoint")(graft.operators.Relational.changepoint(evr).count())
      time("ab_test")(graft.operators.Relational.abTest(evr).count())
      time("dp_counts")(graft.operators.Relational.dpCounts(evr).count())
      time("kmv_distinct")(graft.operators.Sketches.kmvDistinct(evr).count())
      // round-11 operators under the same 20x dup skew: prefix groups
      // hit 20-copy membership, the novelty anti-join and source
      // Jaccard must absorb copies in their distinct collapses, the
      // graph peels see the 20-copy cliques of the doc-level pair
      // relation, and the search evals ride 20x postings
      time("dedup_prefix")(graft.operators.Dedup.prefixDups(d).count())
      time("ngram_novelty")(graft.operators.TextAnalysis.ngramNovelty(d).count())
      time("pii_audit")(graft.operators.TextAnalysis.piiAudit(d).count())
      time("blocklist_screen")(graft.operators.TextAnalysis.blocklistScreen(d).count())
      time("oov_curve")(graft.operators.TextAnalysis.oovCurve(d).count())
      time("source_jaccard")(graft.operators.TextAnalysis.sourceJaccard(d).count())
      time("bm25_tune")(graft.operators.SearchExtras.bm25Tune(d).count())
      time("search_mrr") {
        import spark.implicits._
        graft.operators.SearchExtras.searchMrr(d,
          graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).count()
      }
      time("search_map") {
        import spark.implicits._
        graft.operators.SearchExtras.searchMap(d,
          graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).count()
      }
      time("ltr_features") {
        import spark.implicits._
        graft.operators.SearchExtras.ltrFeatures(d,
          graft.operators.Bm25.DemoQueries.toDF("query_id", "qtext")).count()
      }
      time("kcore")(graft.operators.Graph.kcore(
        graft.operators.Dedup.verifiedNearDups(d)).count())
      time("kcore_store_build") {
        graft.operators.DedupStore.build(d, "/tmp/scale/kcore_store"); 0L
      }
      time("kcore_staged")(graft.operators.DedupStore
        .kcoreDegrees(spark, "/tmp/scale/kcore_store").count())
      time("ktruss_staged")(graft.operators.DedupStore
        .ktrussEdges(spark, "/tmp/scale/kcore_store").count())
      time("triangles_staged")(graft.operators.DedupStore
        .triangleCounts(spark, "/tmp/scale/kcore_store").count())
      time("clustering_coef_staged")(graft.operators.DedupStore
        .clusteringCoefs(spark, "/tmp/scale/kcore_store").count())
      time("ktruss")(graft.operators.Graph.ktruss(
        graft.operators.Dedup.verifiedNearDups(d)).count())
      time("clustering_coef")(graft.operators.Graph.clusteringCoef(
        graft.operators.Dedup.verifiedNearDups(d)).count())
      graft.sources.Bucketed.writeBucketed(d, "probe_docs_a", "doc_id", 32)
      graft.sources.Bucketed.writeBucketed(
        graft.operators.Bm25.docLengths(d), "probe_dl", "doc_id", 32)
      time("bucketed_join") {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try spark.table("probe_docs_a").join(spark.table("probe_dl"), "doc_id").count()
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    } else if (args.headOption.contains("graph-r11")) {
      // round-11 graph ops under 20x dup skew (run "scale" first):
      // each text gains 20 exact copies → 20-cliques in the verified
      // pair relation — the wedge-bounded ops' worst case (a 20-clique
      // holds 1140 wedges); bfs frontiers grow with edge count only
      val d = spark.read.parquet("/tmp/scale/documents.parquet")
      val storePath = "/tmp/scale_r11_store"
      val time = timed("SCALE") _
      time("store_build") {
        graft.operators.DedupStore.build(d, storePath); 1L
      }
      val ver = graft.operators.DedupStore.verifiedNearDups(spark, storePath)
        .cutLineage()
      val cand = graft.operators.DedupStore.candidates(spark, storePath)
        .cutLineage()
      time("ver_edges")(ver.count())
      time("bfs_hops")(graft.operators.Graph.bfsHops(ver).count())
      time("bridges")(graft.operators.Graph.bridgeEdges(ver).count())
      time("bridges_staged")(graft.operators.DedupStore.bridgeEdges(spark, storePath).count())
      time("diameter_staged")(graft.operators.DedupStore.clusterDiameters(spark, storePath).count())
      time("ego_sizes")(graft.operators.Graph.egoSizes(ver).count())
      time("ego_staged")(graft.operators.DedupStore.egoProfiles(spark, storePath).count())
      time("graph_jaccard")(graft.operators.Graph.jaccardLinkPred(cand).count())
      time("modularity")(graft.operators.Graph.modularity(ver, d).count())
      time("modularity_staged")(
        graft.operators.DedupStore.modularityDecomp(spark, storePath).count())
      time("lp")(graft.operators.Graph.labelPropagation(ver, d).count())
      time("lp_staged")(
        graft.operators.DedupStore.lpCommunities(spark, storePath).count())
      time("ppr")(graft.operators.Graph.personalizedPagerankFrom(ver, d).count())
      time("ppr_staged")(
        graft.operators.DedupStore.pprRanks(spark, storePath).count())
      time("pagerank")(graft.operators.Graph.pagerankFrom(ver, d).count())
      time("pagerank_staged")(
        graft.operators.DedupStore.pagerankRanks(spark, storePath).count())
    } else if (args.headOption.contains("dedupinc")) {
      // attribute q_dedup_store_incremental's cost (r11: 9.26->10.45s
      // in the driver bench): split the key into its three phases at
      // the bench SF and repeat, separating plan shape from the
      // 340-key run's JVM/disk contention band
      val docs = graft.sources.Tables.documents(spark, dir).cutLineage()
      val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val cut = maxId * 4 / 5
      val time = timed("DEDUPINC") _
      (1 to 3).foreach { i =>
        val path = s"/tmp/graft_dedupinc_probe_$i"
        time(s"build80_$i") {
          graft.operators.DedupStore.build(docs.filter(col("doc_id") <= cut), path); 1L
        }
        time(s"update20_$i") {
          graft.operators.DedupStore.update(docs.filter(col("doc_id") > cut), path); 1L
        }
        time(s"serve_$i")(
          graft.operators.DedupStore.verifiedNearDups(spark, path).count())
      }
    } else if (args.headOption.contains("knn-probe")) {
      // quick re-measure on the staged 20x tables (run "scale" first)
      val e = spark.read.parquet("/tmp/scale/embeddings.parquet")
      val time = timed("SCALE") _
      time("knn_brute")(graft.operators.Vectors.knnClassify(e).count())
      time("knn_adaptive")(graft.operators.Vectors.knnClassifyIvf(e).count())
      time("knn_ivf_forced")(graft.operators.Vectors.knnClassifyIvf(e, minIvfReps = 0L).count())
      time("dedup_embcos_lsh")(graft.operators.Ann.lshCosinePairs(
        e, threshold = 0.8, numTables = 32, bitsPerTable = 12).count())
      time("dedup_embcos_brute")(graft.operators.Ann.cosinePairs(e, 0.8).count())
    } else if (args.headOption.contains("q5ab")) {
      // A/B the Q5 join orders on the staged 20x facts (run scale-tpch
      // first): pre-restricted customer + orders-first vs the late
      // region filter riding every fact row through the shuffles
      import org.apache.spark.sql.functions.broadcast
      val out = "/tmp/scale_tpch"
      spark.read.parquet(s"$out/lineitem.parquet").count() // warm cache
      def old(): Long = {
        val li = spark.read.parquet(s"$out/lineitem.parquet")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val o = spark.read.parquet(s"$out/orders.parquet").select("o_orderkey", "o_custkey")
        val c = spark.read.parquet(s"$out/customer.parquet").select("c_custkey", "c_nationkey")
        val n = spark.read.parquet(s"$out/nation.parquet")
        val r = spark.read.parquet(s"$out/region.parquet")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1000000.0).cast("long")).as("revenue_micros"),
            count(lit(1)).as("n_items"))
          .count()
      }
      (1 to 3).foreach { i =>
        timed("Q5AB")(s"new_$i")(graft.operators.Relational.revenueByNation(spark, out).count())
        timed("Q5AB")(s"old_$i")(old())
      }
      val df = graft.operators.Relational.revenueByNation(spark, out)
      df.collect()
      println("===== NEW PLAN =====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    } else if (args.headOption.contains("binary")) {
      // break q_source_binary's cost down: driver-side file LISTING of
      // the 5,000-object landing zone vs the read+md5 tasks, and the
      // effect of the small-file packing knobs (openCostInBytes drives
      // how many tiny files share a task)
      val path = "/tmp/graft_docs_bin_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      require(new java.io.File(path).isDirectory, s"stage first: $path missing")
      val time = timed("BINARY") _
      (1 to 3).foreach { i =>
        time(s"list_only_$i") {
          val idx = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
            spark, Seq(new org.apache.hadoop.fs.Path(path)), Map.empty, None)
          idx.allFiles().size.toLong
        }
        time(s"full_read_$i")(
          spark.read.format("binaryFile").load(path + "/*.bin")
            .select(md5(col("content"))).count())
        time(s"status_only_$i")(
          spark.read.format("binaryFile").load(path + "/*.bin")
            .select(col("length")).count())
      }
      Seq("1048576", "65536", "4096").foreach { oc =>
        spark.conf.set("spark.sql.files.openCostInBytes", oc)
        time(s"read_openCost_$oc")(
          spark.read.format("binaryFile").load(path + "/*.bin")
            .select(md5(col("content"))).count())
      }
      (1 to 2).foreach { i =>
        time(s"noglob_dir_$i")(
          spark.read.format("binaryFile").load(path)
            .select(md5(col("content"))).count())
        time(s"text_source_$i")(
          spark.read.format("text").load(path + "/*.bin").count())
        time(s"pathfilter_$i")(
          spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin").load(path)
            .select(md5(col("content"))).count())
      }
    } else if (args.headOption.contains("scale-tpch")) {
      // 20x FACT tables (lineitem/orders, order keys offset so joins
      // still resolve), dimensions kept at sf0.1 — the realistic scale
      // shape: facts grow, dims don't, per-dim-key fanout rises 20x.
      val out = "/tmp/scale_tpch"
      def rep(t: String, keys: Seq[String]): Unit =
        replicate(spark.read.parquet(s"$dir/$t.parquet"), keys, 20, 100000000L)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      rep("lineitem", Seq("l_orderkey"))
      rep("orders", Seq("o_orderkey"))
      Seq("region", "nation", "customer", "supplier", "part",
          "events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      val tpchKeys = Seq(
        "q_agg", "q_shipping_priority", "q_large_volume", "q_join_multi",
        "q_above_avg", "q_nation_volume", "q_top_supplier", "q_part_supplier",
        "q_local_supplier", "q_revenue_forecast", "q_min_cost_supplier",
        "q_market_share", "q_product_profit", "q_revenue_concentration",
        "q_late_split", "q_order_distribution", "q_small_qty_revenue",
        "q_disjunctive_pred", "q_promo_suppliers", "q_waiting_orders",
        "q_idle_customers", "q_order_priority", "q_returned_items",
        "q_promo_share", "q_topn", "q_window")
      tpchKeys.foreach(n => timed("SCALE-TPCH")(n)(SparkEntry.queries(n)(spark, out).count()))
    } else {
      args.foreach { n =>
        val df = SparkEntry.queries(n)(spark, dir)
        df.collect()
        println(s"========== $n (executed) ==========")
        println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
      }
    }
    spark.stop()
  }
}

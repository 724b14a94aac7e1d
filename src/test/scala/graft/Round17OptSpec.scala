package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Lineage._
import graft.sources.Tables

/** Round-17 OPTIMIZATION pass: the three internals the round changed
  * (lazy lineage cuts, staged-once stream sources/artifacts, pristine
  * store templates copied per run) each get a spec pinning the
  * equivalence the optimization relies on — see OPTIMIZATION_r17.md. */
class Round17OptSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- lazy lineage cuts (Lineage.cut eager=false default) ----

  /** The cut truncates the plan under BOTH modes (LogicalRDD leaf —
    * that is what bounds iterative plan growth), and a multi-cut
    * chain serves identical rows lazy vs eager: the flag is a pure
    * scheduling choice, never a semantics choice. */
  test("lazy cut: plan truncated to LogicalRDD; rows identical to eager across a cut chain") {
    import spark.implicits._
    def chain(): Array[(Long, Long)] = {
      val base = (1L to 500L).toDF("x").cutLineage()
      val step1 = base.groupBy((col("x") % 7).as("k"))
        .agg(sum("x").as("s")).cutLineage()
      // reuse step1 TWICE past a second cut — the reuse shape the
      // engine's protocols depend on
      val step2 = step1.filter(col("s") > 100).cutLineage()
      step1.join(step2, Seq("k"), "left_semi")
        .select("k", "s").as[(Long, Long)].collect().sortBy(_._1)
    }
    val prev = spark.conf.getOption(Lineage.EagerFlag)
    try {
      spark.conf.set(Lineage.EagerFlag, "false")
      val lazyRows = chain()
      val lazyPlan = (1L to 10L).toDF("x").cutLineage()
        .queryExecution.optimizedPlan.toString
      assert(lazyPlan.contains("LogicalRDD") || lazyPlan.contains("ExistingRDD"),
        s"lazy cut must truncate the plan, got: $lazyPlan")
      spark.conf.set(Lineage.EagerFlag, "true")
      val eagerRows = chain()
      assert(lazyRows.toSeq === eagerRows.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Lineage.EagerFlag, v)
        case None => spark.conf.unset(Lineage.EagerFlag)
      }
    }
  }

  /** Lazy materialization is COMPLETE after a partial first action: a
    * limit-style consumer must not leave unmaterialized partitions
    * behind (LocalRDDCheckpointData back-fills), so a later full
    * consumer reads blocks, not a recompute of a dead lineage. */
  test("lazy cut: partial first action still yields a fully readable relation") {
    import spark.implicits._
    val cut = (1L to 1000L).toDF("x").repartition(8).cutLineage()
    assert(cut.limit(3).count() === 3L) // partial consumer first
    assert(cut.count() === 1000L)       // full consumer still complete
    assert(cut.agg(sum("x")).head.getLong(0) === 500500L)
  }

  // ---- staged-once stream sources (Streams.stagedOnce) ----

  /** Two invocations of a staged-slice stream key drain the SAME
    * staged files with fresh checkpoints and must return identical
    * relations — the re-runnability contract the bench's two-pass
    * MIN methodology rides on. The second run must also NOT rewrite
    * the staged source (build-once: same files, same mtimes). */
  test("stagedOnce: re-invocation reuses the staging verbatim and reproduces the result") {
    val r1 = graft.streaming.Streams.transitionsStream(spark, sf)
      .collect().map(_.toString).sorted
    val srcDir = new java.io.File(sys.props("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_trans_stream_src_"))
    assert(srcDir.nonEmpty, "staged source dir must exist after the first drain")
    def sig(d: java.io.File) =
      d.listFiles().map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
    val before = srcDir.map(d => d.getName -> sig(d)).toMap
    val r2 = graft.streaming.Streams.transitionsStream(spark, sf)
      .collect().map(_.toString).sorted
    assert(r1.toSeq === r2.toSeq)
    srcDir.foreach(d => assert(sig(d) === before(d.getName),
      s"staged source ${d.getName} was rewritten by the second drain"))
  }

  /** The staged artifact path must serve the same relation as the
    * inline recompute it replaced: the k-means centroid table staged
    * by kmeansStream equals a fresh Clustering.fit on the same
    * corpus (trained-artifact determinism is what makes the staging
    * legal). */
  test("staged artifacts: reloaded centroids equal a fresh deterministic fit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val fresh = graft.operators.Clustering.fit(emb)
    // the stream key stages under pathTag(dir + "|kmeans|" + 3)
    graft.streaming.Streams.kmeansStream(spark, sf).count()
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest((sf + "|kmeans|3").getBytes("UTF-8")).map("%02x".format(_)).mkString
    val staged = spark.read
      .parquet(sys.props("java.io.tmpdir") + s"/graft_kmeans_stream_cents_$tag")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Long](1).toArray)
    assert(staged.length === fresh.length)
    staged.zip(fresh).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  // ---- pristine store templates (SparkEntry.freshStoreFrom) ----

  /** A file-copied store serves exactly what the directly-built store
    * serves, and a mutation of the copy never leaks back into the
    * template: two copy+ingest rounds from one template yield
    * identical results (the per-run delete-and-rebuild contract). */
  test("freshStoreFrom: copy serves like the build; template survives mutation; reruns identical") {
    import graft.operators.Bm25Index
    val docs = Tables.documents(spark, sf)
    val tmp = sys.props("java.io.tmpdir") + "/graft_r17opt_tpl_" +
      java.util.UUID.randomUUID().toString.take(8)
    val direct = s"$tmp/direct"; val tpl = s"$tmp/tpl"
    Bm25Index.build(docs.filter(col("doc_id") % 5 =!= 0), direct)
    Bm25Index.update(docs.filter(col("doc_id") % 5 === 0), direct)
    val want = Bm25Index.score(spark, direct).collect().map(_.toString).sorted
    Bm25Index.build(docs.filter(col("doc_id") % 5 =!= 0), tpl)
    def copyIngestServe(run: String): Seq[String] = {
      val m = classOf[SparkEntry.type].getDeclaredMethods
        .find(_.getName == "freshStoreFrom").get
      m.setAccessible(true)
      val p = m.invoke(SparkEntry, spark, tpl, s"$tmp/$run").asInstanceOf[String]
      Bm25Index.update(docs.filter(col("doc_id") % 5 === 0), p)
      Bm25Index.score(spark, p).collect().map(_.toString).sorted.toSeq
    }
    assert(copyIngestServe("run1") === want.toSeq)
    assert(copyIngestServe("run2") === want.toSeq,
      "a second copy+ingest must replay in full — the template must stay pristine")
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(tmp))
    ()
  }
}

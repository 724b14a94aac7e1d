package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 OPTIMIZATION pass: the internals this round changed —
  * concurrent independent staged writes ([[Jobs.inParallel]]), the
  * shard merges' file-level copy-through leg, and ivfTune's shared
  * store resolution — each get a spec pinning the equivalence the
  * optimization relies on. See OPTIMIZATION_r18.md. */
class Round18OptSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- Jobs.inParallel (guide §2.6 concurrent action submission) ----

  test("inParallel: runs every thunk, propagates the first failure, handles 0/1 thunks") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    Jobs.inParallel(Seq.empty)
    Jobs.inParallel(Seq(() => { hits.incrementAndGet(); () }))
    assert(hits.get() === 1)
    Jobs.inParallel((1 to 6).map(_ => () => { hits.incrementAndGet(); () }))
    assert(hits.get() === 7)
    // a failing thunk must NOT suppress the others (half-written
    // staging is swept by the commit protocol) and MUST rethrow
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val ex = intercept[IllegalStateException] {
      Jobs.inParallel(Seq(
        () => { ran.incrementAndGet(); () },
        () => throw new IllegalStateException("boom"),
        () => { ran.incrementAndGet(); () }))
    }
    assert(ex.getMessage === "boom")
    assert(ran.get() === 2, "sibling thunks must still run to completion")
  }

  test("inParallel: concurrent Spark actions over a shared lazy cut serve identical rows") {
    import graft.Lineage._
    import spark.implicits._
    // the merge-writer shape: several independent actions whose plans
    // share ONE lazily-checkpointed upstream relation
    val shared = (1L to 2000L).toDF("x")
      .groupBy((col("x") % 13).as("k")).agg(sum("x").as("s"))
      .cutLineage()
    val out = new Array[Long](4)
    Jobs.inParallel((0 until 4).map(i => () => {
      out(i) = shared.filter(col("k") >= i).agg(sum("s")).head.getLong(0)
    }))
    val expect = (0 until 4).map(i =>
      shared.filter(col("k") >= i).agg(sum("s")).head.getLong(0))
    assert(out.toSeq === expect)
  }

  // ---- shard-merge copy-through (DeltaStore.copySubFiles) ----

  /** The copy-through leg must actually ENGAGE on a no-delete merge
    * (prefixed copies of shard A's files land in the merged delta —
    * not a silent fallback to the rewrite), while relation identity
    * to the full rebuild stays spec-gated by the Round16Spec merge
    * tests (set-wise over all six relations, plus the delete-leg
    * fallback). */
  test("dedup merge copy-through: shard-A files land verbatim (prefixed) in the merged delta") {
    import graft.operators.DedupStore
    val docs = graft.sources.Tables.documents(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r18cpt").toString
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
    DedupStore.build(docs.filter(col("doc_id") <= cut), s"$tmp/a")
    DedupStore.build(docs.filter(col("doc_id") > cut), s"$tmp/b")
    DedupStore.mergeStores(spark, s"$tmp/a", s"$tmp/b", s"$tmp/m")
    val fs = graft.sources.DeltaStore.fsOf(spark, tmp)
    def names(store: String, sub: String): Seq[String] =
      graft.sources.DeltaStore.committedDeltas(spark, store).flatMap { d =>
        val p = new org.apache.hadoop.fs.Path(s"$d/$sub")
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).toSeq.map(_.getPath.getName)
          .filter(_.endsWith(".parquet"))
      }
    for (sub <- Seq("members", "reps", "bands", "shingles")) {
      val copied = names(s"$tmp/m", sub).filter(_.startsWith("a0-"))
      assert(copied.nonEmpty, s"merged '$sub' must hold copied shard-A files")
      assert(copied.map(_.stripPrefix("a0-")).toSet === names(s"$tmp/a", sub).toSet,
        s"every shard-A '$sub' file must be copied through verbatim")
    }
    // cands/pairs never copy (cross-side distinct) — no prefixed files
    for (sub <- Seq("cands", "pairs"))
      assert(names(s"$tmp/m", sub).forall(!_.startsWith("a0-")),
        s"'$sub' must be rewritten, not copied")
  }

  // ---- ivfTune shared resolution ----

  /** ivfTune's refactor (one delta/center/query resolution for the
    * whole grid + a cut ground-truth relation) must serve exactly the
    * per-point searchIvfFlat recall it replaced. */
  test("ivfTune equals per-point searchIvfFlat recall on every grid point") {
    import graft.operators.PqIndex
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r18ivf").toString
    PqIndex.buildIvfFlat(emb, s"$tmp/ivf", nLists = 4)
    val grid = Seq(1, 2, 4)
    val tuned = PqIndex.ivfTune(spark, s"$tmp/ivf", queryId = 0L, k = 5, probeGrid = grid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = PqIndex.searchIvfFlat(spark, s"$tmp/ivf", 0L, 5, Int.MaxValue)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    grid.foreach { np =>
      val ids = PqIndex.searchIvfFlat(spark, s"$tmp/ivf", 0L, 5, np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(tuned(np.toLong) === (ids intersect exact).size.toLong,
        s"n_hits at n_probe=$np must match the per-point serve")
    }
  }
}

package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Vectors
import graft.sources.Tables

/** Round-7 additions: scale reworks that must stay EXACT — the
  * IVF-composed kNN (ball-pruned second pass) and the LSH-bucketed
  * cosine pair surface (equality spec lives in AnnSpec next to its
  * operator family). */
class Round7Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val emb = Tables.embeddings(spark, sf)

  test("IVF kNN equals brute-force kNN exactly on BOTH candidate paths") {
    val brute = Vectors.knnClassify(emb).collect().map(_.toSeq.mkString("|")).sorted
    assert(brute.nonEmpty)
    // default: the small-reps direct path at this SF
    val direct = Vectors.knnClassifyIvf(emb).collect().map(_.toSeq.mkString("|")).sorted
    assert(direct.sameElements(brute))
    // forced quantizer path (ball-pruned pass 2)
    val ivf = Vectors.knnClassifyIvf(emb, minIvfReps = 0L)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(ivf.sameElements(brute))
  }

  test("IVF kNN stays exact even with a single probed list") {
    // nProbe=1 forces the ball bound to do ALL the coverage work
    val brute = Vectors.knnClassify(emb).collect().map(_.toSeq.mkString("|")).sorted
    val ivf = Vectors.knnClassifyIvf(emb, nProbe = 1, minIvfReps = 0L)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(ivf.sameElements(brute))
  }

  test("IVF kNN on an empty embeddings table returns empty, not a crash") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
    assert(Vectors.knnClassifyIvf(noVecs).count() == 0)
  }

  test("POS tokenizer: whitelist keeps exactly the lexicon's matching tags") {
    val docs = Tables.documents(spark, sf)
    val all = graft.operators.Bm25.tokenize(docs)
    val nouns = graft.operators.Bm25.tokenizePos(docs).collect()
    assert(nouns.nonEmpty)
    val lex = graft.functions.Text.PosLexicon.toMap
    assert(nouns.forall(r => Set("n", "nz").contains(r.getString(2))))
    assert(nouns.forall(r => lex(r.getString(1)) == r.getString(2)))
    // the whitelist partitions the token stream: every kept token is
    // accounted for across the four tag families + unknown
    val counts = Seq(Seq("n", "nz"), Seq("v"), Seq("adj"), Seq("x"))
      .map(wl => graft.operators.Bm25.tokenizePos(docs, wl).count())
    assert(counts.sum == all.count())
    intercept[IllegalArgumentException] {
      graft.operators.Bm25.tokenizePos(docs, Seq.empty)
    }
  }

  test("IVF kNN candidate join is an equi join, not a cartesian pair scan") {
    val p = Vectors.knnClassifyIvf(emb, minIvfReps = 0L).queryExecution.optimizedPlan.toString
    // the train side must join on list_id; the only nested-loop join
    // allowed is the tiny centroid-table broadcast
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian product:\n$p")
    assert(p.contains("list_id"), s"expected a list_id equi join:\n$p")
  }

  test("sign projection: md5-exact coordinates, full dim grid, zero shuffles") {
    val df = Vectors.projectSigns(emb)
    val out = df.collect()
    val n = emb.filter(col("embedding").isNotNull).count()
    assert(out.length == n * 16)
    // every (vec, dim) cell exactly once
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length == out.length)
    // brute recompute of one vector through the identical md5-sign rule
    val v0 = emb.filter(col("embedding").isNotNull).orderBy("vec_id").limit(1)
      .collect().head
    val vid = v0.getLong(0)
    val qv = v0.getSeq[Float](v0.fieldIndex("embedding"))
      .map(x => math.floor(x.toDouble * 1000).toLong)
    def sign(j: Int, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"proj:$j:$i".getBytes("UTF-8"))
      if ((d(0) & 0x80) == 0) 1L else -1L
    }
    val got = out.filter(_.getLong(0) == vid).sortBy(_.getLong(1)).map(_.getLong(2))
    val want = (0 until 16).map(j => qv.indices.map(i => sign(j, i) * qv(i)).sum)
    assert(got.toSeq == want, s"vec $vid: got ${got.toSeq}, want $want")
    // a projection that shuffles is wrong at any scale: pure map stage
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
  }
}

package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann
import graft.sources.Tables

class AnnSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val emb = Tables.embeddings(spark, sf)

  test("cosine pairs are within [-1, 1] and above threshold") {
    val rows = Ann.cosinePairs(emb, 0.3).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r => val c = r.getDouble(2); c >= 0.3 && c <= 1.0001 })
  }

  test("brute-force top-k is k rows, descending, and excludes the query") {
    val rows = Ann.bruteForceTopK(emb, queryId = 0L, k = 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0L))
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("lsh buckets: every vector lands in exactly numTables buckets") {
    val b = Ann.lshBuckets(emb, numTables = 4, bitsPerTable = 4)
    val perVec = b.groupBy("vec_id").count().collect()
    assert(perVec.forall(_.getLong(1) == 4))
  }

  test("ivf top-k recalls a reasonable fraction of exact top-k") {
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Ann.ivfTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF ANN recall $recall")
  }

  test("staged ANN index search matches live lshTopK exactly") {
    val idx = java.nio.file.Files.createTempDirectory("annidx").toString + "/index"
    graft.operators.AnnIndex.build(emb, idx)
    val live = Ann.lshTopK(emb).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val staged = graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(staged.sameElements(live))
  }

  test("lsh cosine pairs equal the all-pairs exact baseline") {
    val exact = Ann.cosinePairs(emb).collect().map(_.toSeq.mkString("|")).sorted
    val lsh = Ann.lshCosinePairs(emb).collect().map(_.toSeq.mkString("|")).sorted
    assert(exact.nonEmpty)
    assert(lsh.sameElements(exact))
  }

  test("lsh cosine pairs hold recall at the 0.8-threshold 32x12 production point") {
    // the Scaladoc's production recipe for semantic dedup at cosine
    // >=0.8 is numTables=32, bitsPerTable=12 — this pins recall THERE,
    // not just at the 0.45/24x4 gate point: planted pairs at known
    // cosines (near-dup 0.97 and boundary 0.85) must all survive
    // candidate generation. Deterministic end to end: seeded vectors,
    // md5-derived literal hyperplanes.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def rndVec(): Array[Double] = norm(Array.fill(dim)(rnd.nextGaussian()))
    // random unit vector orthogonal to a: controls the planted cosine
    def perp(a: Array[Double]): Array[Double] = {
      val r = rndVec()
      val d = r.zip(a).map { case (ri, ai) => ri * ai }.sum
      norm(r.zip(a).map { case (ri, ai) => ri - d * ai })
    }
    val base = Array.fill(40)(rndVec())
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    base.zipWithIndex.foreach { case (v, i) => rows += ((i.toLong, v.map(_.toFloat))) }
    var id = 1000L
    var next = 0
    Seq(0.97 -> 10, 0.85 -> 10).foreach { case (c, k) =>
      (0 until k).foreach { _ =>
        val a = base(next); next += 1
        val u = perp(a)
        val s = math.sqrt(1 - c * c)
        rows += ((id, a.zip(u).map { case (ai, ui) => (c * ai + s * ui).toFloat }))
        id += 1
      }
    }
    val df = rows.toSeq.toDF("vec_id", "embedding")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosinePairs(df, 0.8))
    val lsh = pairs(Ann.lshCosinePairs(df, 0.8, numTables = 32, bitsPerTable = 12))
    assert(exact.size >= 20, s"expected all 20 planted pairs >=0.8, got ${exact.size}")
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size} pairs at the production point")
  }

  test("lsh cosine pairs reject a threshold below the S-curve midpoint") {
    intercept[IllegalArgumentException] {
      Ann.lshCosinePairs(emb, threshold = -0.9, numTables = 2, bitsPerTable = 8)
    }
  }

  test("pq top-k: k rows, adc non-negative, recalls a reasonable fraction of exact") {
    val rows = Ann.pqTopK(emb, 0L, 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0L))
    assert(rows.forall(_.getLong(1) >= 0L)) // ADC is an exact squared distance
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val recall = exact.count(rows.map(_.getLong(0)).toSet.contains).toDouble / exact.size
    assert(recall >= 0.3, s"PQ ANN recall $recall")
    // deterministic: trained codebooks have fixed seeds, ties break on
    // centroid index — a second run reproduces the ranking exactly
    val again = Ann.pqTopK(emb, 0L, 10).collect()
    assert(again.map(_.toSeq).sameElements(rows.map(_.toSeq)))
  }

  test("ivf+pq top-k: probed-list candidates only, deterministic, reasonable recall") {
    val rows = Ann.ivfPqTopK(emb, 0L, 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0L))
    assert(rows.forall(_.getLong(1) >= 0L))
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val recall = exact.count(rows.map(_.getLong(0)).toSet.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVFPQ recall $recall")
    val again = Ann.ivfPqTopK(emb, 0L, 10).collect()
    assert(again.map(_.toSeq).sameElements(rows.map(_.toSeq)))
  }

  test("staged flat-IVF index search matches live ivfExactTopK exactly") {
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/index"
    graft.operators.PqIndex.buildIvfFlat(emb, idx)
    val live = Ann.ivfExactTopK(emb).collect().map(_.toSeq)
    val staged = graft.operators.PqIndex.searchIvfFlat(spark, idx).collect().map(_.toSeq)
    assert(staged.sameElements(live))
  }

  test("deterministic flat-IVF recalls a reasonable fraction of exact top-k") {
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Ann.ivfExactTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.3, s"deterministic IVF recall $recall")
  }

  test("staged PQ index search matches live pqTopK exactly") {
    val idx = java.nio.file.Files.createTempDirectory("pqidx").toString + "/index"
    graft.operators.PqIndex.build(emb, idx)
    val live = Ann.pqTopK(emb).collect().map(_.toSeq)
    val staged = graft.operators.PqIndex.searchTopK(spark, idx).collect().map(_.toSeq)
    assert(staged.sameElements(live))
  }

  test("staged IVF+PQ index search matches live ivfPqTopK exactly") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpqidx").toString + "/index"
    graft.operators.PqIndex.buildIvf(emb, idx)
    val live = Ann.ivfPqTopK(emb).collect().map(_.toSeq)
    val staged = graft.operators.PqIndex.searchIvfTopK(spark, idx).collect().map(_.toSeq)
    assert(staged.sameElements(live))
  }

  test("lsh top-k recalls a reasonable fraction of exact top-k") {
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Ann.lshTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.4, s"LSH ANN recall $recall")
  }

  test("hamming signatures match a literal sign-bit computation; rerank cos is exact") {
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sig(v: Array[Float]): (Long, Long, Long, Long) = {
      def chunk(c: Int) = (0 until 16).map(i =>
        if (v(c * 16 + i) > 0f) 1L << i else 0L).sum
      (chunk(0), chunk(1), chunk(2), chunk(3))
    }
    def ham(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    val qs = sig(vecs(0L))
    val rows = Ann.hammingTopK(emb, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10)
    rows.foreach { case (id, h, cos) =>
      assert(h == ham(sig(vecs(id)), qs), s"vec $id hamming")
      val (va, vb) = (vecs(0L).map(_.toDouble), vecs(id).map(_.toDouble))
      val exact = va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(cos - exact) < 1e-3, s"vec $id cos $cos vs $exact")
    }
  }

  test("hamming candidates recall most of the exact top-k (the 1-bit quantization trade)") {
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Ann.hammingTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"hamming ANN recall $recall")
  }

  test("batch ANN: per-query rows equal the single-query brute force") {
    val batch = Ann.batchTopK(emb, Seq(0L, 1L, 2L), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(batch.length == 30)
    Seq(0L, 1L, 2L).foreach { q =>
      val single = Ann.bruteForceTopK(emb, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toList
      val fromBatch = batch.filter(_._1 == q).sortBy(_._4).map(r => (r._2, r._3)).toList
      assert(fromBatch == single, s"query $q: batch != single")
    }
  }

  test("incremental ANN index: build+update equals live LSH on the union; replay and dup-id guards hold") {
    val idx = java.nio.file.Files.createTempDirectory("annidxinc").toString + "/index"
    val a = emb.filter(col("vec_id") % 5 =!= 0)
    val b = emb.filter(col("vec_id") % 5 === 0)
    graft.operators.AnnIndex.build(a, idx)
    graft.operators.AnnIndex.update(b, idx, "00001")
    val staged = graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val live = Ann.lshTopK(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(staged == live, "staged incremental search != live LSH on the union")
    // replaying the same tag is a no-op, not a duplicate ingest
    graft.operators.AnnIndex.update(b, idx, "00001")
    assert(graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList == live)
    // re-ingesting existing ids under a NEW tag is rejected loudly
    val e = intercept[IllegalArgumentException] {
      graft.operators.AnnIndex.update(b, idx, "00002")
    }
    assert(e.getMessage.contains("re-ingests"), e.getMessage)
    // ingesting with different hyperplane params is rejected loudly
    // (incompatible bucket space would silently corrupt searches)
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.AnnIndex.update(
        b.withColumn("vec_id", col("vec_id") + 1000000L), idx, "00003",
        numTables = 4, bitsPerTable = 4)
    }
    assert(e2.getMessage.contains("LSH params"), e2.getMessage)
  }

  test("ANN compaction folds deltas to one with identical search results") {
    val idx = java.nio.file.Files.createTempDirectory("anncompact").toString + "/index"
    graft.operators.AnnIndex.build(emb.filter(col("vec_id") % 3 === 0), idx)
    graft.operators.AnnIndex.update(emb.filter(col("vec_id") % 3 === 1), idx, "00001")
    graft.operators.AnnIndex.update(emb.filter(col("vec_id") % 3 === 2), idx, "00002")
    val before = graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    graft.operators.AnnIndex.compactDeltas(spark, idx)
    assert(graft.sources.DeltaStore.committedDeltas(spark, idx).size == 1)
    val after = graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(after == before, "compaction changed search results")
    // compacted store still accepts (and range-guards) new ingest
    val e = intercept[IllegalArgumentException] {
      graft.operators.AnnIndex.update(emb.limit(5), idx, "00003")
    }
    assert(e.getMessage.contains("re-ingests"))
  }

  test("streaming ANN ingest: micro-batched deltas converge to the full build") {
    val tmp = java.nio.file.Files.createTempDirectory("annstream").toString
    val idx = s"$tmp/index"
    val src = s"$tmp/src"
    // stage the vectors as 3 files -> 3 micro-batches
    emb.repartitionByRange(3, col("vec_id")).write.parquet(src)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val sq = graft.streaming.Streams.annIndexIngest(spark, stream, idx, s"$tmp/ckpt")
    try sq.processAllAvailable() finally sq.stop()
    assert(graft.sources.DeltaStore.committedDeltas(spark, idx).size >= 2,
      "expected multiple micro-batch deltas")
    val staged = graft.operators.AnnIndex.searchTopK(spark, idx)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val live = Ann.lshTopK(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(staged == live, "streamed ANN index != live LSH after drain")
  }

  test("ann stream: streamed micro-batches reproduce the one-plan batch rows") {
    val streamed = graft.streaming.Streams.annStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted
    val batch = Ann.batchTopK(emb, Seq(0L, 1L, 2L), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted
    assert(streamed.sameElements(batch))
  }
}

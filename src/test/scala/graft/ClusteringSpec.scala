package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Clustering, Dedup}
import graft.sources.Tables

class ClusteringSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf)

  // -- k-means ------------------------------------------------------------

  test("kmeans assigns every non-NULL vector exactly once, to an existing cluster") {
    val out = Clustering.kmeans(emb, k = 8, iters = 2).collect()
    assert(out.length == emb.filter(col("embedding").isNotNull).count())
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    assert(out.forall(_.getLong(2) >= 0L))
  }

  test("kmeans d2 is the exact min over the final centroids (self-consistency)") {
    // iters=0 pins the centroids to the seed vectors: d2 of a seed to
    // itself is 0 and every assignment must match a brute recompute
    val seeds = emb.orderBy("vec_id").limit(3)
      .select(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val out = Clustering.kmeans(emb, k = 3, iters = 0)
    val qv = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    out.collect().foreach { r =>
      val (vid, cid, d2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val brute = seeds.zipWithIndex.map { case (c, i) =>
        (qv(vid).zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i.toLong)
      }.min
      assert((d2, cid) == brute, s"vec $vid: got ($d2,$cid), brute $brute")
    }
  }

  test("kmeans iteration strictly reduces (or keeps) total within-cluster d2") {
    def totalD2(iters: Int): Long =
      Clustering.kmeans(emb, k = 8, iters = iters)
        .agg(sum("d2")).collect().head.getLong(0)
    val t0 = totalD2(0)
    val t2 = totalD2(2)
    assert(t2 <= t0, s"Lloyd's must not increase the objective: iters0=$t0 iters2=$t2")
  }

  test("kmeans on an obvious two-blob dataset separates the blobs") {
    val mk = (base: Double) => Array.tabulate(64)(i => (base + i * 0.001).toFloat)
    val rows = (0L to 5L).map { id =>
      val blob = if (id % 2 == 0) 0.9 else -0.9
      (id, 0, mk(blob))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = Clustering.kmeans(df, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val even = Set(0L, 2L, 4L).map(out)
    val odd = Set(1L, 3L, 5L).map(out)
    assert(even.size == 1 && odd.size == 1 && even != odd,
      s"blobs must land in two distinct clusters: $out")
  }

  test("clusterSample respects the per-cluster quota in exact md5 order") {
    val quota = 5
    val out = Clustering.clusterSample(emb, perCluster = quota).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = out.groupBy(_._2)
    assert(byCluster.values.forall(_.length <= quota))
    assert(out.forall(_._3 >= 1L) && out.forall(_._3 <= quota))
    // the sample is the md5-order prefix of the full cluster assignment
    val full = Clustering.kmeans(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def hk(v: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cs:$v".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    full.groupBy(_._2).foreach { case (cid, members) =>
      val want = members.map(_._1).sortBy(v => (hk(v), v)).take(quota)
        .zipWithIndex.map { case (v, i) => (v, cid, i + 1L) }.toSet
      val got = byCluster.getOrElse(cid, Array.empty).toSet
      assert(got == want, s"cluster $cid: sample is not the md5-order prefix")
    }
  }

  test("kmeans stream: streamed micro-batch assignments equal the batch run") {
    val streamed = graft.streaming.Streams.kmeansStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = Clustering.kmeans(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  // -- semantic clustering / drop ----------------------------------------

  test("semanticClusters equals CC over the exact all-pairs cosine graph") {
    val viaLsh = Clustering.semanticClusters(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactPairs = Ann.cosinePairs(emb, 0.45)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val viaExact = Dedup.propagateMinLabels(exactPairs, 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLsh == viaExact,
      s"LSH-candidate CC diverged from exact CC (${viaLsh.size} vs ${viaExact.size} members)")
  }

  test("semanticClusters labels duplicate-value groups through their representative") {
    val v = Array.tabulate(64)(i => (0.1 + i * 0.01).toFloat)
    val w = Array.tabulate(64)(i => (0.9 - i * 0.01).toFloat) // far from v in angle? ensure distinct cluster by orthogonal-ish
    val df = Seq((10L, 0, v), (11L, 0, v), (12L, 0, v), (20L, 0, w))
      .toDF("vec_id", "label", "embedding")
    val out = Clustering.semanticClusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the three identical vectors form one cluster labeled by the min id
    assert(out.get(10L).contains(10L) && out.get(11L).contains(10L) && out.get(12L).contains(10L))
  }

  test("kmeans with k exceeding the corpus still assigns every vector") {
    val mk = (base: Double) => Array.tabulate(8)(i => (base + i * 0.01).toFloat)
    val df = Seq((1L, 0, mk(0.1)), (2L, 0, mk(0.5)), (3L, 0, mk(0.9)))
      .toDF("vec_id", "label", "embedding")
    val out = Clustering.kmeans(df, k = 5, iters = 2).collect()
    assert(out.length == 3)
    // only as many clusters as seeds exist
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 3))
  }

  test("zero-norm vectors join no semantic cluster but survive semanticDrop") {
    val v = Array.tabulate(8)(i => (0.2 + i * 0.01).toFloat)
    val zero = Array.fill(8)(0.0f)
    val df = Seq((1L, 0, v), (2L, 0, v), (3L, 0, zero))
      .toDF("vec_id", "label", "embedding")
    val clusters = Clustering.semanticClusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L), s"got $clusters")
    val kept = Clustering.semanticDrop(df).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"canonical + zero-norm survive: $kept")
  }

  test("projectSigns skips NULL embeddings and rejects an all-NULL input") {
    val v = Array.tabulate(8)(i => (0.3 + i * 0.01).toFloat)
    val df = Seq((1L, 0, Some(v)), (2L, 0, None))
      .toDF("vec_id", "label", "embedding")
    val out = graft.operators.Vectors.projectSigns(df).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(1L))
    assert(out.length == 16)
    intercept[IllegalArgumentException] {
      graft.operators.Vectors.projectSigns(
        Seq((9L, 0, Option.empty[Array[Float]])).toDF("vec_id", "label", "embedding"))
    }
  }

  test("semanticDrop keeps one canonical per cluster plus all unclustered vectors") {
    val clusters = Clustering.semanticClusters(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val losers = clusters.collect { case (v, c) if v != c => v }.toSet
    val all = emb.filter(col("embedding").isNotNull).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val kept = Clustering.semanticDrop(emb).collect().map(_.getLong(0)).toSet
    assert(kept == all -- losers)
  }
}

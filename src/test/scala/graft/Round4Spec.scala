package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Bm25Index, Dedup, Relational, Sketches, Skew, Vectors}
import graft.sources.Tables

/** Round-4 operators: index serving, bloom semi-join, CMS heavy
  * hitters, vector analytics, OLAP additions. */
class Round4Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("index batchSearch equals corpus batchSearch") {
    import spark.implicits._
    val path = "/tmp/graft-test-idx-serve"
    Bm25Index.build(docs, path)
    val queries = Bm25.DemoQueries.toDF("query_id", "qtext")
    val fromIndex = Bm25Index.batchSearch(spark, path, queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val fromCorpus = Bm25.batchSearch(docs, queries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(fromIndex == fromCorpus && fromIndex.nonEmpty)
  }

  test("streaming search serves every query with the batch result") {
    import spark.implicits._
    val path = "/tmp/graft-test-idx-serve2"
    Bm25Index.build(docs, path)
    val qdir = "/tmp/graft-test-stream-q"
    Bm25.DemoQueries.toDF("query_id", "qtext").write.mode("overwrite").parquet(qdir)
    val streamed = graft.streaming.Streams.searchStream(spark, qdir, path).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val batch = Bm25.batchSearch(docs, Bm25.DemoQueries.toDF("query_id", "qtext")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming search accumulates across MULTIPLE micro-batches") {
    import spark.implicits._
    val path = "/tmp/graft-test-idx-serve3"
    Bm25Index.build(docs, path)
    val qdir = "/tmp/graft-test-stream-q-multi"
    // one file per query (sequential single-partition appends guarantee
    // 3 part files) + maxFilesPerTrigger=1 → one micro-batch per query;
    // the drained result must still equal the whole batch
    Bm25.DemoQueries.zipWithIndex.foreach { case (q, i) =>
      Seq(q).toDF("query_id", "qtext").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(qdir)
    }
    val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val streamed = graft.streaming.Streams
      .searchStream(spark, qdir, path, maxFilesPerTrigger = Some(1),
        onBatch = { id => batchIds.add(id); () }).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // the cross-batch accumulation claim is only proven if >1 batch ran
    assert(batchIds.size >= 3, s"expected >=3 micro-batches, saw ${batchIds.size}")
    val batch = Bm25.batchSearch(docs, Bm25.DemoQueries.toDF("query_id", "qtext")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("bloom semi-join equals the plain semi-join") {
    val li = Tables.lineitem(spark, sf)
    val keys = Tables.orders(spark, sf).filter(col("o_totalprice") > 200000.0)
      .select("o_orderkey")
    val viaBloom = Skew.bloomSemiJoin(li, keys, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBloom == plain && viaBloom.nonEmpty)
  }

  test("CMS heavy hitters: superset of exact, est within (e/w)*N overcount") {
    val (d, w) = (4, 2048)
    val hh = Sketches.heavyHitters(docs, minShare = 0.01, d = d, w = w).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Bm25.tokenize(docs).groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val trueHeavy = exact.filter { case (_, n) => n >= total * 0.01 }
    // CMS never undercounts → every true heavy hitter is present
    assert(trueHeavy.keySet.subsetOf(hh.keySet) && trueHeavy.nonEmpty)
    val epsN = math.ceil(math.E / w * total).toLong
    hh.foreach { case (t, est) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est >= tru, s"$t undercounted: $est < $tru")
      assert(est <= tru + epsN + 1, s"$t overcounted beyond bound: $est vs $tru")
    }
  }

  test("centroid outliers: every returned distance >= any non-returned distance") {
    val out = Vectors.centroidOutliers(emb, k = 5).collect()
    assert(out.length == 5)
    val d2s = out.map(_.getLong(2))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b })
  }

  test("kNN prediction equals a driver-side 5-NN majority recomputation") {
    val rows = Vectors.knnClassify(emb, k = 5).collect()
    val nTest = emb.filter(col("vec_id") % 10 === 0).count()
    assert(rows.length == nTest && nTest > 0)
    assert(rows.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 5L))
    // recompute the whole contract in plain Scala (labels in this
    // synthetic set are random, so accuracy is chance — the CONTRACT,
    // exact distances + deterministic tie-breaks, is what we pin)
    val all = emb.select("vec_id", "label", "embedding").collect().map { r =>
      (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    }
    val train = all.filter(_._1 % 10 != 0)
    val want = all.filter(_._1 % 10 == 0).map { case (id, _, mv) =>
      val nn = train.filter(_._1 != id)
        .map { case (nid, nl, nv) =>
          (nid, nl, mv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (nid, _, d2) => (d2, nid) }.take(5)
      val (lbl, votes) = nn.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (l, v) => (-v, l) }.head
      id -> ((lbl, votes.toLong))
    }.toMap
    val got = rows.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("running distinct kinds is monotone per user and bounded by kind count") {
    val rows = Relational.runningDistinctKinds(Tables.events(spark, sf))
      .orderBy("user_id", "event_id").collect()
    assert(rows.nonEmpty)
    val nKinds = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= nKinds))
  }

  test("partitioned layout prunes partitions, not just row groups") {
    val path = "/tmp/graft-test-bylang"
    graft.sources.Sinks.writePartitioned(docs, path, "lang")
    val df = spark.read.parquet(path).filter(col("lang") === "en")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"lang predicate not applied as a partition filter:\n$scan")
    // result equality with the unpartitioned route
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.filter(col("lang") === "en").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("pagerank: mass bounded, isolated docs hold exactly the teleport floor") {
    val ranks = graft.operators.Graph.pagerank(docs, iterations = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val r0 = graft.operators.Graph.TotalMass / n
    val teleport = 15L * r0 / 100L
    assert(ranks.size == n)
    // floor division only loses mass: total in (0, TotalMass]
    val total = ranks.values.sum
    assert(total > 0 && total <= graft.operators.Graph.TotalMass)
    // every rank >= teleport floor; docs outside the near-dup graph sit exactly on it
    assert(ranks.values.forall(_ >= teleport))
    val connected = Dedup.verifiedNearDups(docs).select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    ranks.foreach { case (node, rank) =>
      if (!connected.contains(node)) assert(rank == teleport, s"isolated $node rank $rank")
      else assert(rank > teleport, s"connected $node stuck at teleport")
    }
  }

  test("train split is deterministic, total, and near 80/10/10") {
    val a = graft.operators.TextAnalysis.trainSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.operators.TextAnalysis.trainSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b && a.size == docs.count())
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(math.abs(frac("train") - 0.8) < 0.1 && frac("val") < 0.2 && frac("test") < 0.2)
    // growth stability: a subset corpus assigns every surviving doc identically
    val sub = graft.operators.TextAnalysis.trainSplit(docs.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (id, s) => a(id) == s })
  }

  test("argmax picks the customer with the true max/min account balance") {
    val cust = Tables.customer(spark, sf)
    val got = Relational.richestCustomerPerNation(cust).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val rows = cust.select("c_nationkey", "c_name", "c_acctbal", "c_custkey").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (nk, cs) =>
      val richest = cs.maxBy(c => (c._3, c._4))._2
      val poorest = cs.minBy(c => (c._3, c._4))._2
      assert(got(nk) == ((richest, poorest)), s"nation $nk")
    }
  }
}

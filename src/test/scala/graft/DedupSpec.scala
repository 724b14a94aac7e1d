package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  test("exact dedup covers every document exactly once") {
    val total = Dedup.exact(docs).agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == docs.count())
  }

  test("shingles are 3-word windows, distinct per doc") {
    val sh = Dedup.shingles(docs).collect()
    assert(sh.nonEmpty)
    assert(sh.forall(_.getString(1).split(" ").length == 3))
  }

  test("ngram jaccard finds the planted near-dups, all >= threshold") {
    val pairs = Dedup.ngramJaccard(docs, 0.8).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("dropDuplicates removes exactly the verified near-dups' higher ids") {
    val kept = Dedup.dropDuplicates(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val verified = Dedup.verifiedNearDups(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.nonEmpty)
    assert(verified.forall { case (_, b) => !kept.contains(b) })
    val losers = verified.map(_._2).toSet
    assert(kept.size == docs.count() - losers.size) // no exact dups in corpus
    // an unverified candidate (band collision below the jaccard
    // threshold) must NOT cost us its document
    val unverified = Dedup.minhashCandidates(docs)
      .collect().map(r => r.getLong(1)).toSet -- losers
    assert(unverified.forall(kept.contains), "unverified candidates were dropped")
  }

  test("minhash candidates recall the high-jaccard pairs") {
    val exact = Dedup.ngramJaccard(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // j >= 0.9 → per-band collision ~ j^4 ≥ 0.65, 4 bands → miss ~ 1.5%
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall of ${exact.size} gold pairs")
  }

  test("simhash banded pairs find exactly the pairs within the hamming threshold") {
    val fp = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val want = (for {
      (da, fa) <- fp; (db, fb) <- fp if da < db && ham(fa, fb) <= 3
    } yield (da, db, ham(fa, fb).toLong)).toSet
    val got = Dedup.simhashPairs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want) // pigeonhole banding is exact, not approximate
    assert(got.nonEmpty)
  }

  test("near-dup clusters: every verified pair shares a cluster labeled by its min member") {
    val pairs = Dedup.verifiedNearDups(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val cluster = Dedup.nearDupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // each cluster's label is its minimum member
    cluster.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl labeled above its min member")
    }
  }

  test("label propagation converges on a long path graph in O(log diameter) rounds") {
    import spark.implicits._
    // a 200-node path has diameter 199 — plain min-propagation needs
    // ~199 rounds; pointer doubling must finish well under maxIter=20
    val path = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.propagateMinLabels(path, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 0L), "single component must all label 0")
    // two disjoint paths stay distinct components
    val two = ((0L until 50L).map(i => (i, i + 1)) ++
      (100L until 150L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val lbl2 = Dedup.propagateMinLabels(two, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl2.filter(_._1 <= 50).values.toSet == Set(0L))
    assert(lbl2.filter(_._1 >= 100).values.toSet == Set(100L))
  }

  test("parameter guards: mismatched LSH threshold, degenerate hamming radius, non-positive maxIter") {
    // a verify threshold far below the banding's S-curve midpoint
    // would silently lose most boundary pairs — rejected loudly
    val e1 = intercept[IllegalArgumentException] {
      Dedup.verifiedNearDups(docs, threshold = 0.4)
    }
    assert(e1.getMessage.contains("S-curve"), e1.getMessage)
    // degenerate SimHash radii: negative divides by zero, large ones
    // collapse buckets to corpus fractions
    intercept[IllegalArgumentException] { Dedup.simhashPairs(docs, maxHamming = -1) }
    intercept[IllegalArgumentException] { Dedup.simhashPairs(docs, maxHamming = 30) }
    // non-positive iteration budget is a caller error, not
    // "did not converge"
    val e2 = intercept[IllegalArgumentException] {
      Dedup.nearDupClusters(docs, maxIter = 0)
    }
    assert(e2.getMessage.contains("positive"), e2.getMessage)
  }

  test("simhash is a 60-bit fingerprint and near-dups have small hamming distance") {
    val fp = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.values.forall(v => v >= 0L && v < (1L << 60)))
    val nearDup = Dedup.ngramJaccard(docs, 0.9).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDup.nonEmpty)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dists = nearDup.map { case (a, b) => ham(fp(a), fp(b)) }
    assert(dists.forall(_ <= 12), s"near-dup hamming distances too large: ${dists.toSeq}")
  }

  test("dupSpans finds cross-doc spans only; spanFlags rolls them up per doc") {
    import spark.implicits._
    // doc 1/2 share an 8-token span; doc 3 repeats its own span twice
    // (self-repetition: NOT duplication); doc 4 is too short to window
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha $span beta"),
      (2L, s"gamma $span delta"),
      (3L, s"$span epsilon $span"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val dup = Dedup.dupSpans(df).collect()
    // every window of the shared 11-token overlap region is NOT shared;
    // only the exact 8-token span itself appears in doc 1, 2 AND 3
    assert(dup.length == 1)
    assert(dup(0).getLong(1) == 3 && dup(0).getLong(2) == 4) // n_docs, n_occ (doc 3 twice)
    val flags = Dedup.spanFlags(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(flags(1L) == ((3L, 1L, false)))   // 10 tokens -> 3 windows, 1 dup
    assert(flags(2L) == ((3L, 1L, false)))
    assert(flags(3L) == ((10L, 2L, false)))  // 17 tokens -> 10 windows, 2 dup occurrences
    assert(flags(4L) == ((0L, 0L, true)))    // too short to window -> kept
  }

  test("scrubSpans keeps the first occurrence and scrubs every other") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha $span beta"),
      (2L, s"gamma $span delta"),
      (3L, s"$span epsilon $span"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.scrubSpans(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // first occurrence is (1, pos 1): doc 1 untouched
    assert(out(1L) == ((s"alpha $span beta", 0L)))
    // doc 2 loses the 8 span tokens, keeps its frame
    assert(out(2L) == (("gamma delta", 8L)))
    // doc 3: both its occurrences are non-first -> 16 tokens scrubbed
    assert(out(3L) == (("epsilon", 16L)))
    // too short to window: verbatim (normalized space)
    assert(out(4L) == (("tiny doc", 0L)))
    // corpus: scrub covers every doc; untouched docs round-trip the
    // normalized text, and scrubbing happened somewhere
    val scrub = Dedup.scrubSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(scrub.size == docs.count())
    assert(scrub.values.exists(_._2 > 0))
    val untouched = Dedup.spanFlags(docs).collect()
      .filter(_.getLong(2) == 0).map(_.getLong(0))
    val norm = docs.select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    untouched.foreach(id => assert(scrub(id) == ((norm(id), 0L))))
  }

  test("fuzzy contamination finds the cross-split near-dups and only them") {
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val probes = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("probe_id"), col("text"))
    val found = Dedup.fuzzyContamination(train, probes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(found.nonEmpty)
    assert(found.forall(_._3 >= 0.5))
    // exact cross-split Jaccard baseline, computed driver-side at the
    // test SF: every high-J pair must be recalled (8 bands of 2 puts
    // the candidate probability at ~1 for J >= 0.9)
    val sh = Dedup.shingles(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val gold = for {
      (d, dsh) <- sh.toSeq if d % 5 != 0
      (p, psh) <- sh.toSeq if p % 5 == 0
      j = (dsh & psh).size.toDouble / (dsh | psh).size if j >= 0.9
    } yield (d, p)
    assert(gold.nonEmpty)
    val foundPairs = found.map(f => (f._1, f._2)).toSet
    assert(gold.forall(foundPairs.contains), s"missed gold pairs: ${gold.filterNot(foundPairs.contains)}")
    // threshold far below the banding midpoint is rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.fuzzyContamination(train, probes, threshold = 0.2)
    }
  }

  test("span operators on the corpus: dup spans exist and flags cover every doc") {
    val dup = Dedup.dupSpans(docs).collect()
    assert(dup.nonEmpty)
    assert(dup.forall(r => r.getLong(1) >= 2 && r.getLong(2) >= r.getLong(1)))
    val flags = Dedup.spanFlags(docs)
    assert(flags.count() == docs.count())
    val flagged = flags.filter(col("n_dup_windows") > 0).count()
    assert(flagged > 0 && flagged < docs.count())
  }

  test("keep-best finishes dedup: one longest rep per cluster, loners keep themselves") {
    val clusters = Dedup.nearDupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val kept = Dedup.keepBest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lens = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly one kept doc per cluster, and it is the (longest, min-id) member
    val byCluster = clusters.groupBy(_._2)
    val keptClustered = kept.filter(k => byCluster.contains(k._2)).toMap
    assert(keptClustered.size == byCluster.size)
    byCluster.foreach { case (cid, members) =>
      val want = members.map(_._1).minBy(id => (-lens(id), id))
      assert(keptClustered.collectFirst { case (id, c) if c == cid => id }.contains(want),
        s"cluster $cid kept wrong rep")
    }
    // loners all present with self-cluster; total = #clusters + #loners
    val clusteredIds = clusters.map(_._1).toSet
    val loners = lens.keySet -- clusteredIds
    assert(kept.filter(k => loners.contains(k._1)).forall(k => k._1 == k._2))
    assert(kept.length == byCluster.size + loners.size)
  }
}

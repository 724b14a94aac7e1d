package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup, DedupStore, Graph, Relational, SemanticStore}
import graft.sources.Tables

/** Round-11 scale-shape fixes: the df-capped record-linkage blocking
  * key, the pair-driven dedup verify join, and the defensive edge
  * normalization in assortativity. */
class Round11Spec extends AnyFunSuite {
  import SparkTestSession._

  // ---- record linkage: blocking tokens above the df cap are dropped ----

  test("record linkage drops blocking tokens above the df cap (planted skew)") {
    import spark.implicits._
    // 150 names share the token "common" (df=150 > cap=100) and are
    // otherwise near-identical — WITHOUT the cap each would block with
    // all 149 others and the jw>=0.8 pairs would flood the result.
    // Two names share the rare token "zzyzx" (df=2) and must link.
    val skewed = (0 until 150).map(i => s"common name$i")
    val rare = Seq("zzyzx widget alpha", "zzyzx widget alphq")
    val part = (skewed ++ rare).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("p_partkey", "p_name")
    val got = Relational.recordLinkage(part, threshold = 0.8, dfCap = 100L)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(got.contains(("zzyzx widget alpha", "zzyzx widget alphq")),
      "rare-token block must still link its near-identical pair")
    // every surviving pair must share a sub-cap token: none of the
    // "common name*" pairs qualify (their only shared token is capped,
    // and nameN tokens are unique) — block sizes are bounded by the cap
    assert(!got.exists { case (a, b) =>
      a.startsWith("common") && b.startsWith("common") },
      "pairs blocked ONLY by the over-cap token must not appear")
  }

  test("record linkage result is unchanged by the cap when no token exceeds it") {
    import spark.implicits._
    val part = Seq("alpha beta gamma", "alpha beta gamma!", "delta epsilon zeta")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("p_partkey", "p_name")
    val capped = Relational.recordLinkage(part, 0.8, dfCap = 100L).collect().toSet
    val uncapped = Relational.recordLinkage(part, 0.8, dfCap = Long.MaxValue).collect().toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  // ---- pair-driven verify: boilerplate shingles cannot amplify ----

  test("planted boilerplate shingle: staged pairs equal the live verify") {
    import spark.implicits._
    // every doc opens with the same 4-token boilerplate (so one
    // shingle is common to ALL docs — the co-shingle self-join's
    // worst case), but only consecutive doc pairs are near-dups
    val docs = (0 until 40).map { i =>
      val body = (0 until 12).map(j => s"w${(i / 2) * 100 + j}").mkString(" ")
      (i.toLong, s"terms of service apply $body", i)
    }.toDF("doc_id", "text", "n_chars")
      .withColumn("n_chars", length(col("text")))
    val path = java.nio.file.Files.createTempDirectory("r11store").toString + "/s"
    DedupStore.build(docs, path)
    val staged = DedupStore.verifiedNearDups(spark, path)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val live = Dedup.verifiedNearDups(docs)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(staged.nonEmpty, "planted near-dups must be found")
    assert(staged.toSeq == live.toSeq)
    // the even/odd twins differ in zero body tokens → jaccard 1.0 pairs
    assert(staged.length >= 20, s"expected >=20 twin pairs, got ${staged.length}")
  }

  // ---- SemanticStore: staged pair serve + incremental ingest ----

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toList.sortBy(_.mkString("|"))

  test("staged SemanticStore cosinePairs == live lshCosinePairs") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("semstore").toString + "/s"
    SemanticStore.build(emb, path)
    val staged = sortedRows(SemanticStore.cosinePairs(spark, path))
    val live = sortedRows(Ann.lshCosinePairs(emb))
    assert(staged.nonEmpty, "corpus must produce at least one cosine pair")
    assert(staged == live)
  }

  test("SemanticStore incremental build+update == full rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val cut = maxId * 3 / 5
    val full = java.nio.file.Files.createTempDirectory("semfull").toString + "/s"
    val inc = java.nio.file.Files.createTempDirectory("seminc").toString + "/s"
    SemanticStore.build(emb, full)
    SemanticStore.build(emb.filter(col("vec_id") <= cut), inc)
    SemanticStore.update(emb.filter(col("vec_id") > cut), inc)
    assert(sortedRows(SemanticStore.cosinePairs(spark, inc)) ==
      sortedRows(SemanticStore.cosinePairs(spark, full)), "cosinePairs differ")
    assert(sortedRows(SemanticStore.semanticClusters(spark, inc)) ==
      sortedRows(SemanticStore.semanticClusters(spark, full)), "clusters differ")
  }

  test("SemanticStore update rejects non-monotone and duplicate ids") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("semrej").toString + "/s"
    SemanticStore.build(emb.filter(col("vec_id") > 10), path)
    val low = intercept[IllegalArgumentException] {
      SemanticStore.update(emb.filter(col("vec_id") <= 10), path)
    }
    assert(low.getMessage.contains("monotone"))
    val dup = intercept[IllegalArgumentException] {
      SemanticStore.update(emb.filter(col("vec_id") > 10), path)
    }
    assert(dup.getMessage.contains("re-ingests"))
  }

  // ---- assortativity: dirty edge input is normalized ----

  test("assortativity is invariant to duplicate and unnormalized edges") {
    import spark.implicits._
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val dirty = clean
      .union(clean.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .union(clean) // duplicates + swapped orientation
    val a = Graph.assortativity(clean).collect()(0)
    val b = Graph.assortativity(dirty).collect()(0)
    assert(a.toSeq == b.toSeq)
  }
}

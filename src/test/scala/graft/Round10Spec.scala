package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupStore}
import graft.sources.Tables

/** Round-10 staged dedup substrate: every decision served from
  * [[DedupStore]] must equal its live [[Dedup]] derivation row-for-row
  * — the store is a performance artifact, never a semantic one. */
class Round10Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("dedupstore").toString + "/store"
    DedupStore.build(docs, p)
    p
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      case x => x
    }.toList).toList.sortBy(_.mkString("|"))

  private def assertSame(staged: DataFrame, live: DataFrame, what: String): Unit = {
    assert(staged.columns.toSeq == live.columns.toSeq, s"$what: column mismatch")
    val (s, l) = (rows(staged), rows(live))
    assert(s.nonEmpty, s"$what: staged result is empty — nothing was compared")
    assert(s == l, s"$what: staged != live (${s.size} vs ${l.size} rows)")
  }

  test("staged verifiedNearDups == live") {
    assertSame(DedupStore.verifiedNearDups(spark, store),
      Dedup.verifiedNearDups(docs), "verifiedNearDups")
  }

  test("staged nearDupClusters == live") {
    assertSame(DedupStore.nearDupClusters(spark, store),
      Dedup.nearDupClusters(docs), "nearDupClusters")
  }

  test("staged keepBest == live") {
    assertSame(DedupStore.keepBest(docs, store), Dedup.keepBest(docs), "keepBest")
  }

  test("staged dropDuplicates == live") {
    assertSame(
      DedupStore.dropDuplicates(docs, store).select("doc_id", "n_chars"),
      Dedup.dropDuplicates(docs).select("doc_id", "n_chars"), "dropDuplicates")
  }

  test("staged containmentPairs == live") {
    assertSame(DedupStore.containmentPairs(spark, store),
      Dedup.containmentPairs(docs), "containmentPairs")
  }

  test("staged dropContained == live") {
    assertSame(DedupStore.dropContained(spark, store),
      Dedup.dropContained(docs).select("doc_id"), "dropContained")
  }

  test("staged serve rejects a threshold below the banding midpoint") {
    intercept[IllegalArgumentException] {
      DedupStore.verifiedNearDups(spark, store, threshold = 0.3)
    }
    ()
  }
}

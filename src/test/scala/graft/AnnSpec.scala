package graft

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

  test("lsh top-k recalls a reasonable fraction of exact top-k") {
    val exact = Ann.bruteForceTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx = Ann.lshTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.4, s"LSH ANN recall $recall")
  }
}

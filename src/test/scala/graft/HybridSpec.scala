package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Hybrid}
import graft.sources.Tables

class HybridSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("batch search with one query reproduces single-query searchTopN") {
    import spark.implicits._
    val single = Bm25.searchTopN(docs, Bm25.QueryTerms, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val batch = Bm25.batchSearch(docs,
        Seq(1 -> Bm25.QueryTerms.mkString(" ")).toDF("query_id", "qtext"), k = 10)
      .orderBy(col("rk"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(batch.sameElements(single))
  }

  test("batch search ranks every query independently") {
    import spark.implicits._
    val res = Bm25.batchSearch(docs, Bm25.DemoQueries.toDF("query_id", "qtext"), k = 5)
    val perQuery = res.groupBy("query_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perQuery.values.forall(_ <= 5))
    res.collect().groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rrf fuses both rankings: top result appears in at least one source list") {
    val fused = Hybrid.rrfSearch(docs, emb).collect()
    assert(fused.length == 10)
    val rrfs = fused.map(_.getDouble(1))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // every fused score is attainable: ≤ 2/(60+1) and > 0
    assert(rrfs.forall(r => r > 0 && r <= 2.0 / 61.0 + 1e-9))
  }
}

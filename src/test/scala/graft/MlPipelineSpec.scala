package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, MlPipeline}
import graft.sources.Tables

/** The MLlib feature-extraction route must agree with the hand-built
  * aggregation route on everything except the (documented) IDF
  * convention. */
class MlPipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  test("ml tf cells match the aggregation-route tf exactly") {
    val ml = MlPipeline.tfIdf(docs).select("doc_id", "term", "tf")
    val agg = Bm25.tf(docs).select("doc_id", "term", "tf")
    assert(ml.exceptAll(agg).isEmpty && agg.exceptAll(ml).isEmpty)
  }

  test("ml tfidf equals tf * ln((N+1)/(df+1)) from the aggregation route") {
    val n = docs.count()
    val expected = Bm25.tf(docs)
      .join(Bm25.df(docs), "term")
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(lit(n + 1.0) / (col("df") + lit(1))), 6).as("tfidf_ml"))
    val ml = MlPipeline.tfIdf(docs).select("doc_id", "term", "tfidf_ml")
    assert(ml.exceptAll(expected).isEmpty && expected.exceptAll(ml).isEmpty)
  }

  test("ml-route bm25 scores equal the aggregation-route scores") {
    val ml = MlPipeline.bm25Score(docs)
    val agg = Bm25.bm25Score(docs)
    assert(ml.exceptAll(agg).isEmpty && agg.exceptAll(ml).isEmpty)
  }
}

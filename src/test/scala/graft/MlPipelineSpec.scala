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

  test("lr quality classifier agrees with the heuristic it was trained on") {
    val scored = MlPipeline.qualityClassifier(docs)
    val n = scored.count()
    val agree = scored.filter(col("predicted_ok") === col("heuristic_ok")).count()
    assert(n > 0 && agree.toDouble / n >= 0.9, s"agreement ${agree.toDouble / n}")
  }

  test("MinHashLSH pairs are a subset of exact ngram-jaccard pairs, with recall") {
    val exact = graft.operators.Dedup.ngramJaccard(docs)
      .select("doc_a", "doc_b", "jaccard")
    val ml = MlPipeline.minhashLshPairs(docs).select("doc_a", "doc_b", "jaccard")
    // precision 1.0: MLlib rescans pairs, so every emitted pair is true
    assert(ml.exceptAll(exact).isEmpty, "LSH emitted a pair the exact join rejects")
    val nExact = exact.count()
    if (nExact > 0) {
      val found = ml.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
      assert(found.toDouble / nExact >= 0.5, s"recall ${found.toDouble / nExact}")
    }
  }
}

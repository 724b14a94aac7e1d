package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, Upsert, Vectors}
import graft.sources.Tables

/** Round-5 operators: keyword extraction, LM scoring, entropy,
  * quantization, streaming upsert convergence. (TPC-H shapes and the
  * source round-trips are oracle-gated; plan shapes in PlanSpec.) */
class Round5Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("keywords: at most k per doc, ranked by tfidf desc with term tiebreak") {
    val rows = TextAnalysis.keywords(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (d, ks) =>
      assert(ks.length <= 3, s"doc $d has ${ks.length} keywords")
      val ordered = ks.sortBy(_._4)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"doc $d rank order broken")
      }
    }
  }

  test("bigram LM: probabilities at most 1, so mean log-prob <= 0") {
    val rows = TextAnalysis.bigramLm(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "doc with no bigrams must not appear")
      assert(r.getDouble(2) <= 0.0, s"doc ${r.getLong(0)} has positive mean log-prob")
    }
  }

  test("entropy: bounded by ln(n_types); ttr in (0, 1]") {
    val rows = TextAnalysis.tokenEntropy(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dl, nTypes, ttr, h) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nTypes <= dl)
      assert(ttr > 0.0 && ttr <= 1.0)
      // uniform distribution maximizes H at ln(n_types); rounding slack
      assert(h >= -1e-4 && h <= math.log(nTypes.toDouble) + 1e-4,
        s"doc ${r.getLong(0)}: H=$h outside [0, ln($nTypes)]")
    }
  }

  test("int8 quantization: range bounded, every nonzero vector hits ±127") {
    val rows = Vectors.quantizeInt8(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, q, _) => q >= -127L && q <= 127L })
    rows.groupBy(_._1).foreach { case (id, dims) =>
      val scale = dims.head._4
      if (scale > 0L) {
        // the max-|x| dim quantizes to exactly ±127 (floor(±maxabs·127/maxabs))
        assert(dims.exists(d => d._3 == 127L || d._3 == -127L),
          s"vec $id never reaches full scale")
      } else assert(dims.forall(_._3 == 0L), s"zero vector $id has nonzero qval")
    }
  }

  test("streaming upsert converges to batch last-wins across >= 4 micro-batches") {
    val streamed = graft.streaming.Streams.upsertStream(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    val batch = Upsert.lastWins(Tables.events(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }
}

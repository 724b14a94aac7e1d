package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational, TextAnalysis}
import graft.sources.Tables

/** Round-9 operators: CDC apply, temperature mixture sampling,
  * held-out-LM perplexity, DSIR importance weights, length-bucketed
  * batching, chunk-level boilerplate profiling. The DuckDB oracle is
  * the exactness gate; these specs pin the semantic invariants the
  * hash can't express.
  */
class Round9Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val events = Tables.events(spark, sf)

  test("cdc apply: users whose LAST op is a delete are absent; others carry last value") {
    val state = Relational.cdcApply(events).collect()
    // independent recompute of last op per user via max_by on (ts, event_id)
    val last = events
      .groupBy("user_id")
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_value"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
    val got = state.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == last.filter(_._2._1 != "error").keySet)
    got.foreach { case (u, (micros, nOps)) =>
      assert(micros == math.floor(last(u)._2 * 1000000.0).toLong)
      assert(nOps == last(u)._3)
    }
  }

  test("temperature mix: deterministic, a subset, and rates bounded to (0,1]") {
    val a = TextAnalysis.temperatureMix(docs).collect().map(_.getLong(0)).sorted
    val b = TextAnalysis.temperatureMix(docs).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < docs.count())
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(all.contains))
    // τ=1 degenerates to a flat targetFrac rate for every source
    val flat = TextAnalysis.temperatureMix(docs, tau = 1.0, targetFrac = 1.0)
    assert(flat.count() == docs.count()) // rate 1.0 keeps everything
  }

  test("doc perplexity: ppl consistent with avg_logprob; bigram counts match doc lengths") {
    val rows = TextAnalysis.docPerplexity(docs).collect()
    val want = docs
      .select(col("doc_id"), (size(split(lower(col("text")), " ")) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == want.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == want(r.getLong(0)))
      val lp = r.getDouble(2)
      assert(lp < 0.0)
      assert(math.abs(r.getDouble(3) -
        BigDecimal(math.exp(-lp)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // in-sample (even doc_id) docs read as more probable on average
    // than held-out docs under the LM trained on them
    val (inS, outS) = rows.partition(r => r.getLong(0) % 2 == 0)
    assert(inS.map(_.getDouble(2)).sum / inS.length > outS.map(_.getDouble(2)).sum / outS.length)
  }

  test("importance weights: per-doc sum replays from independently collected counts") {
    val rows = TextAnalysis.importanceWeights(docs).collect()
    // driver-side recompute from raw token lists
    val toks = docs.select(col("doc_id"), col("lang"), split(lower(col("text")), " ").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val cr = toks.flatMap(_._3).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ct = toks.filter(_._2 == "en").flatMap(_._3).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val (nr, nt, v) = (cr.values.sum, ct.values.sum, cr.size.toLong)
    val want = toks.map { case (id, _, ts) =>
      id -> ts.map { t =>
        math.log((ct.getOrElse(t, 0L) + 1).toDouble / (nt + v)) -
          math.log((cr(t) + 1).toDouble / (nr + v))
      }.sum
    }.toMap
    assert(rows.length == toks.length)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - want(r.getLong(0))) < 1e-3)
      assert(r.getLong(1) == toks.find(_._1 == r.getLong(0)).get._3.length)
    }
  }

  test("length buckets: bucket = len div 64, batches hold <= 8 docs of one (source, bucket)") {
    val rows = TextAnalysis.lengthBuckets(docs).collect()
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) / 64))
    val batches = rows.groupBy(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    batches.foreach { case (_, rs) => assert(rs.length <= 8) }
    // batch ids are contiguous from 0 within each (source, bucket)
    rows.groupBy(r => (r.getString(1), r.getLong(3))).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(4)).distinct.sorted.toVector
      assert(ids == (0L until ids.length.toLong).toVector)
    }
  }

  test("chunk dups: a doc sharing its full text with another has dup_ratio 1.0") {
    import spark.implicits._
    val base = docs.filter(col("text").isNotNull).limit(4)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val dupped = (base.toSeq :+ (9999L -> base.head._2)).toDF("doc_id", "text")
    val prof = Dedup.chunkDups(dupped).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(prof(base.head._1)._3 == 1.0 && prof(9999L)._3 == 1.0)
    prof.foreach { case (_, (n, d, ratio)) =>
      assert(d <= n && ratio >= 0.0 && ratio <= 1.0)
    }
    // on the real corpus the profile covers every non-null doc
    assert(Dedup.chunkDups(docs).count() == docs.filter(col("text").isNotNull).count())
  }

  test("streaming minhash dedup: union of micro-batches equals the batch candidate set") {
    val streamed = graft.streaming.Streams.minhashDedupStream(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    streamed.foreach { case (a, b) => assert(a < b) }
  }

  test("bpe: first merge is the argmax pair; merge counts non-increasing; deterministic") {
    val pairs = graft.operators.Bpe.pairCounts(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val top = pairs.minBy { case ((l, r), c) => (-c, l, r) }
    val merges = graft.operators.Bpe.trainMerges(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(merges.nonEmpty)
    assert((merges.head._2, merges.head._3) == top._1 && merges.head._4 == top._2)
    merges.sliding(2).foreach {
      case Array(a, b) => assert(a._4 >= b._4) // greedy max is non-increasing
      case _ =>
    }
    val again = graft.operators.Bpe.trainMerges(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(merges.sameElements(again))
  }

  test("bpe encode: segments concatenate back to the word and shrink with more merges") {
    val merges = graft.operators.Bpe.trainMerges(docs).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val words = graft.operators.Bpe.wordCounts(docs)
      .orderBy(col("wcount").desc, col("word")).limit(20)
      .collect().map(_.getString(0))
    words.foreach { w =>
      val segs = graft.operators.Bpe.encode(w, merges)
      assert(segs.mkString == w)
      assert(segs.length <= w.length)
      assert(graft.operators.Bpe.encode(w, merges.take(3)).length >= segs.length)
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector analytics beyond search: per-class centroids, distance
  * outliers, and k-NN label prediction over the embeddings table.
  *
  * Arithmetic contract (SURVEY.md §6): every float component is
  * quantized ONCE to exact integer "millis" (floor(x·1000) — bounded
  * by ±~1000 for unit-scale embeddings), and all distances are
  * integer sums of squared millis differences, so results are
  * bit-identical across engines and partition orders. Centroids are
  * floor(Σmillis / n) — integer division, exact and bounded
  * regardless of class cardinality, so nothing overflows at any
  * corpus size.
  *
  * Scale shape: centroids shuffle on (label, dim) — cardinality
  * #classes × dim, tiny — then broadcast back; distances are a pure
  * map stage. k-NN is the brute-force baseline (quadratic in the
  * class size); [[Ann.ivfTopK]]'s coarse quantizer is the 100 TB
  * route for the same contract.
  */
object Vectors {

  /** millis-quantized dim-exploded view: (vec_id, label, dim, m). */
  private def dims(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      posexplode(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
        .as(Seq("dim", "m")))

  /** (vec_id, label, d2): squared millis distance of every vector to
    * its own class centroid, top `k` farthest (the "does this doc
    * belong to its cluster" outlier probe). */
  def centroidOutliers(embeddings: DataFrame, k: Int = 10): DataFrame = {
    val d = dims(embeddings)
    val centroids = d.groupBy("label", "dim")
      // floor over the IEEE quotient of two exact integers — the same
      // expression the oracle runs, so the centroid is engine-identical
      .agg(floor(sum("m").cast("double") / count(lit(1))).cast("long").as("c"))
    d.join(centroids, Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum((col("m") - col("c")) * (col("m") - col("c"))).as("d2"))
      .orderBy(col("d2").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("d2"))
  }

  /** (vec_id, true_label, predicted_label, n_votes): k-NN majority
    * vote — vectors with vec_id ≡ 0 (mod `testMod`) are the test
    * split, scored against all others by exact millis L2; ties break
    * (distance asc, neighbor id asc) for the neighbor set and
    * (votes desc, label asc) for the vote. */
  def knnClassify(embeddings: DataFrame, k: Int = 5, testMod: Int = 10): DataFrame = {
    // millis as integer-valued DOUBLES: ‖a-b‖² = ‖a‖²+‖b‖²-2a·b via the
    // codegen'd native dot — no per-pair intermediate array, and every
    // product/sum stays an exact integer ≪ 2^53, so the cast back to
    // BIGINT is lossless
    val e = embeddings.select(col("vec_id"), col("label"),
      // floor() yields BIGINT — cast back to DOUBLE for the native dot
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))").as("mv"))
      .withColumn("n2", graft.functions.Native.dot(col("mv"), col("mv")))
    val test = e.filter(col("vec_id") % testMod === 0)
      .select(col("vec_id"), col("label").as("true_label"), col("mv").as("qa"), col("n2").as("qa2"))
    val train = e.filter(col("vec_id") % testMod =!= 0)
      .select(col("vec_id").as("nb_id"), col("label").as("nb_label"), col("mv").as("qb"), col("n2").as("qb2"))
    val d2 = (col("qa2") + col("qb2") -
      lit(2.0) * graft.functions.Native.dot(col("qa"), col("qb"))).cast("long")
    val wNbr = Window.partitionBy("vec_id").orderBy(col("d2").asc, col("nb_id").asc)
    // the TEST split is the small side — broadcast it into the train
    // partitions (train is corpus-sized and must stay distributed)
    val neighbors = train.join(broadcast(test), col("vec_id") =!= col("nb_id"))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(wNbr))
      .filter(col("rk") <= k)
    val wVote = Window.partitionBy("vec_id").orderBy(col("n_votes").desc, col("nb_label").asc)
    neighbors.groupBy("vec_id", "true_label", "nb_label")
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("vec_id"), col("true_label").cast("long").as("true_label"),
        col("nb_label").cast("long").as("predicted_label"), col("n_votes"))
  }

  /** (vec_id, dim_idx, unit): L2-normalized embeddings, exploded —
    * the mandatory preprocessing before cosine ANN (normalized
    * vectors turn cosine into a plain dot product, which is what the
    * LSH/IVF stages index). Pure map stage, zero shuffles; zero-norm
    * vectors are DROPPED (their direction is undefined — emitting
    * NaNs would poison any downstream dot). round 6: one sqrt + one
    * division over the same doubles on both engines. */
  def l2Normalize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.Native.dot(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
      .select(col("vec_id"), col("nrm"), posexplode(col("v")).as(Seq("dim_idx", "x")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        round(col("x") / col("nrm"), 6).as("unit"))

  /** (vec_id, dim_idx, qval, scale_micros): symmetric int8
    * quantization of the embedding store — per-vector scale =
    * max|x|/127, qval = floor(x·127/max|x|) ∈ [−127, 127]. The
    * compression step every billion-vector ANN deployment takes (4×
    * smaller store, SIMD int8 dot products); emitted EXPLODED so the
    * quantized values are oracle-comparable row by row. Pure map
    * stage — zero shuffles at any scale; an all-zero vector gets
    * qval 0 everywhere (scale 0 marks it degenerate). The final
    * clamp guarantees the int8 range even for DOUBLE inputs, where
    * fl(x·127)/maxabs at x = ±maxabs can land one ulp outside ±127
    * (float inputs are exact in double and always hit full scale). */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .select(col("vec_id"), col("maxabs"), posexplode(col("v")).as(Seq("dim_idx", "x")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        when(col("maxabs") === 0.0, lit(0L))
          .otherwise(greatest(lit(-127L),
            least(lit(127L), floor(col("x") * lit(127.0) / col("maxabs")).cast("long"))))
          .as("qval"),
        floor(col("maxabs") * lit(1000000.0)).cast("long").as("scale_micros"))
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV) sketch as a typed `Aggregator`: the k smallest
  * DISTINCT hash values per group. Because md5 is uniform, the bottom
  * k hashes are (a) a deterministic uniform sample of the group's
  * distinct values — the replayable replacement for reservoir
  * sampling, which needs RNG state — and (b) the classic KMV distinct
  * -count estimator (≈ (k-1)/max(bottom-k), normalized).
  *
  * This is the custom-AGGREGATION rung of the extension ladder (the
  * expression rung is DotProduct/MinHashWords): state is a bounded
  * sorted array of ≤ k strings regardless of group size, merged
  * associatively — exactly what `collect_set` + sort + slice cannot
  * promise (its state is the whole set). Registered for DataFrame use
  * via `functions.udaf`.
  */
class BottomK(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[String] = Vector.empty

  /** Insert keeping the buffer sorted, distinct and ≤ k long. */
  override def reduce(buf: Seq[String], value: String): Seq[String] = {
    if (value == null) return buf
    if (buf.length == k && value >= buf.last) return buf
    if (buf.contains(value)) return buf
    ((buf :+ value).sorted).take(k)
  }

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-interleaved) clustered parquet layout for
  * MULTI-dimensional data skipping.
  *
  * A single-column sort gives parquet files narrow min/max ranges on
  * the leading column only — predicates on any other column scan
  * everything. Interleaving the bit representations of per-column
  * bucket ranks orders rows along a space-filling curve, so every
  * output file covers a small hyper-rectangle of the keyspace and
  * min/max stats prune files for predicates on ANY clustered column.
  * At 100 TB this is the difference between "selective two-column
  * probe reads a handful of files" and "reads the table".
  *
  * Buckets are EQUI-DEPTH (approx-quantile cut points, computed on a
  * GK sketch — one pass, skew-robust); equi-width bucketing collapses
  * under the skewed value distributions real tables have.
  */
object Zorder {

  /** The Morton code of `cols` as a Column: each column is ranked into
    * 2^bits equi-depth buckets (native binary-search
    * [[graft.functions.EquiDepthBucket]] against its cut-point array —
    * O(bits) per row, codegen'd), then bucket bits are interleaved
    * (column 0 owns the low bit of each group). */
  private def mortonCode(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val nBuckets = 1 << bits
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // the multi-column overload sketches every column in ONE scan
    val allCuts = df.stat.approxQuantile(cols.toArray, qs, 0.001)
    val buckets = cols.zip(allCuts).map { case (c, cuts) =>
      // bucket = number of cut points <= value (0..2^bits-1). An empty
      // or all-null column yields NO cut points — that column is one
      // big bucket (rank 0)
      if (cuts.isEmpty) lit(0)
      else graft.functions.Native.bucket(col(c).cast("double"), cuts)
    }
    val terms = for {
      b <- 0 until bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).cast("long") bitwiseAND 1L, b * cols.length + i)
    terms.reduce(_ + _)
  }

  /** Write `df` z-ordered by `cols`: range-partition on the Morton
    * code (so files tile the curve) and sort within partitions (so
    * row groups tile it too). The code is MATERIALIZED once as a
    * transient column — computed in one projection, consumed by both
    * the range exchange and the sort — and dropped before the write,
    * so the written schema is unchanged. */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 8, nFiles: Int = 16): Unit = {
    df.withColumn("__graft_z", mortonCode(df, cols, bits))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

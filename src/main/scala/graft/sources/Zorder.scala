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
    * 2^bits equi-depth buckets via its cut-point array, then bucket
    * bits are interleaved (column 0 owns the low bit of each group). */
  private def mortonCode(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val nBuckets = 1 << bits
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // the multi-column overload sketches every column in ONE scan
    val allCuts = df.stat.approxQuantile(cols.toArray, qs, 0.001)
    val bucketExprs = cols.zip(allCuts).map { case (c, cuts) =>
      // bucket = number of cut points <= value (0..2^bits-1); the cut
      // array is a broadcast-sized literal evaluated per row. An empty
      // or all-null column yields NO cut points — that column is one
      // big bucket (rank 0), not invalid SQL
      if (cuts.isEmpty) "0"
      else {
        val arr = cuts.mkString("array(", "D, ", "D)")
        s"size(filter($arr, __c -> CAST($c AS DOUBLE) >= __c))"
      }
    }
    val terms = for {
      b <- 0 until bits
      (be, i) <- bucketExprs.zipWithIndex
    } yield s"shiftleft(CAST(shiftright($be, $b) AS BIGINT) & 1, ${b * cols.length + i})"
    expr(terms.mkString("(", " + ", ")"))
  }

  /** Write `df` z-ordered by `cols`: range-partition on the Morton
    * code (so files tile the curve) and sort within partitions (so
    * row groups tile it too). The code is a transient sort key — the
    * written schema is unchanged. */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 8, nFiles: Int = 16): Unit = {
    val z = mortonCode(df, cols, bits)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

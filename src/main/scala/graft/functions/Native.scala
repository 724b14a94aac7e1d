package graft.functions

import org.apache.spark.sql.{Column, GraftShims}

/** Column-API entry points for graft's native Catalyst expressions.
  * These construct the expressions DIRECTLY (via [[GraftShims]]), so
  * every operator in the library works on a plain `SparkSession`;
  * installing [[GraftExtensions]] additionally makes the same
  * functions callable by name from SQL (`graft_dot(...)` etc.). */
object Native {
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
  def shingles(words: Column, n: Int): Column =
    GraftShims.column(ShingleWords(GraftShims.expression(words), n))
  def charNgrams(s: Column, n: Int): Column =
    GraftShims.column(CharNgrams(GraftShims.expression(s), n))
  def minhash(words: Column, n: Int, numPerm: Int): Column =
    GraftShims.column(MinHashWords(GraftShims.expression(words), n, numPerm))
  def simhash(words: Column): Column =
    GraftShims.column(SimHashWords(GraftShims.expression(words)))
  def segment(text: Column, dict: Column): Column =
    GraftShims.column(SegmentWords(GraftShims.expression(text), GraftShims.expression(dict)))
  def bucket(value: Column, cuts: Array[Double]): Column =
    GraftShims.column(EquiDepthBucket(GraftShims.expression(value), cuts))
  def hyperplaneBuckets(vec: Column, numTables: Int, bitsPerTable: Int): Column =
    GraftShims.column(HyperplaneBuckets(GraftShims.expression(vec), numTables, bitsPerTable))
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShims.column(JaroWinkler(GraftShims.expression(a), GraftShims.expression(b)))
}

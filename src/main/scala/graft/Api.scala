package graft

import org.apache.spark.sql.SparkSession

/** The SQL-only consumption surface: register the engine's tables as
  * temp views so a user can drive everything from `spark.sql` — the
  * graft native functions (`graft_dot`, `graft_minhash`,
  * `graft_simhash`, `graft_shingles`, `graft_char_ngrams`) are already
  * SQL-visible through [[graft.functions.GraftExtensions]], so the
  * DataFrame API is a convenience, not a requirement. */
object Api {
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { t =>
      graft.sources.Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
}

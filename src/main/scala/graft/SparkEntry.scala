package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query key has a DuckDB-runnable oracle in [[oracleSql]]; the
  * column names/types and rounding are kept identical on both sides
  * (SURVEY.md §6).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Bm25.searchTopN(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Core BM25 / text-search surface (SURVEY §2 #1-12) ----
    "q_tokenize" -> ((s, dir) => Bm25.tokenize(Tables.documents(s, dir))),
    "q_wordcount" -> ((s, dir) =>
      Bm25.tokenize(Tables.documents(s, dir)).groupBy("term").agg(count(lit(1)).as("n"))),
    "q_tf" -> ((s, dir) => Bm25.tf(Tables.documents(s, dir))),
    "q_topk_terms" -> ((s, dir) => Bm25.topKTerms(Tables.documents(s, dir))),
    "q_df" -> ((s, dir) => Bm25.df(Tables.documents(s, dir))),
    "q_idf" -> ((s, dir) => Bm25.idf(Tables.documents(s, dir))),
    "q_tfidf" -> ((s, dir) => Bm25.tfIdf(Tables.documents(s, dir))),
    "q_doc_stats" -> ((s, dir) => Bm25.corpusStats(Tables.documents(s, dir))),
    "q_bm25_score" -> ((s, dir) => Bm25.bm25Score(Tables.documents(s, dir))),
    "q_search_topn" -> ((s, dir) => Bm25.searchTopN(Tables.documents(s, dir))),
    "q_postings" -> ((s, dir) => Bm25.postings(Tables.documents(s, dir), maxDf = 1000)),
    "q_idf_upsert" -> ((s, dir) => Upsert.lastWins(Tables.events(s, dir))),
  )

  // ---------------------------------------------------------------
  // Oracle SQL (DuckDB dialect; tables registered by the driver with
  // their plain names). The token/tf CTE prefix mirrors
  // Bm25.tokenize/tf exactly.
  // ---------------------------------------------------------------
  private val stop = Text.stopwordsSqlList

  private val tfCte =
    s"""tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
       |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) >= ${Text.MinTokenLength} AND term NOT IN ($stop)),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok2 GROUP BY doc_id, term)""".stripMargin

  private val dlCte =
    s"""$tfCte,
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |nd AS (SELECT count(*)::BIGINT AS n_docs FROM dl)""".stripMargin

  private val queryTermsSql = Bm25.QueryTerms.map(t => s"'$t'").mkString(", ")

  private val bm25Cte =
    s"""$dlCte,
       |avgd AS (SELECT avg(dl)::DOUBLE AS avgdl FROM dl),
       |idfq AS (SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
       |         FROM dft, nd WHERE term IN ($queryTermsSql)),
       |scored AS (
       |  SELECT tf.doc_id,
       |         round(sum(idfq.idf * (tf.tf * (${Bm25.K1} + 1.0)) /
       |               (tf.tf + ${Bm25.K1} * (1.0 - ${Bm25.B} + ${Bm25.B} * dl.dl / avgd.avgdl))), 4) AS score
       |  FROM tf
       |  JOIN idfq ON tf.term = idfq.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN avgd
       |  GROUP BY tf.doc_id)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_tokenize" ->
      s"WITH $tfCte SELECT doc_id, term FROM tok2",
    "q_wordcount" ->
      s"WITH $tfCte SELECT term, count(*)::BIGINT AS n FROM tok2 GROUP BY term",
    "q_tf" ->
      s"WITH $tfCte SELECT doc_id, term, tf FROM tf",
    "q_topk_terms" ->
      s"""WITH $tfCte,
         |ranked AS (SELECT doc_id, term, tf,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC)::INT AS rk FROM tf)
         |SELECT doc_id, term, tf, rk FROM ranked WHERE rk <= ${Bm25.MaxWordCount}""".stripMargin,
    "q_df" ->
      s"WITH $tfCte SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term",
    "q_idf" ->
      s"""WITH $dlCte
         |SELECT term, df, round(ln(n_docs::DOUBLE / (df + 1)), 6) AS idf FROM dft, nd""".stripMargin,
    "q_tfidf" ->
      s"""WITH $dlCte,
         |idft AS (SELECT term, round(ln(n_docs::DOUBLE / (df + 1)), 6) AS idf FROM dft, nd)
         |SELECT tf.doc_id, tf.term, tf.tf, round(tf.tf * idft.idf, 6) AS tfidf
         |FROM tf JOIN idft ON tf.term = idft.term""".stripMargin,
    "q_doc_stats" ->
      s"""WITH $dlCte
         |SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens,
         |       round(avg(dl), 6) AS avgdl FROM dl""".stripMargin,
    "q_bm25_score" ->
      s"WITH $bm25Cte SELECT doc_id, score FROM scored",
    "q_search_topn" ->
      s"WITH $bm25Cte SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10",
    "q_postings" ->
      s"""WITH $tfCte
         |SELECT term, count(*)::BIGINT AS df,
         |       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
         |FROM tf GROUP BY term HAVING count(*) <= 1000""".stripMargin,
    "q_idf_upsert" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type AS last_type, round(value, 6) AS last_value, ts_ms AS last_ts_ms
        |FROM ranked WHERE rn = 1""".stripMargin,
  )
}

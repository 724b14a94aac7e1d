package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-wins merge — the distributed analogue of the reference's
  * MongoDB `findOneAndUpdate(upsert=true)` sinks (MongoTFSink.java,
  * BatchBM25PreMain.java:106-122, which upsert per-key documents).
  * A mutable-store upsert becomes, in a shared-nothing engine, a
  * window dedup: latest version per key. One shuffle on the key; at
  * 100 TB the key (user/doc id) is high-cardinality so no skew.
  */
object Upsert {
  /** (user_id, last_type, last_value, last_ts_ms): latest event per
    * user, ordered by (ts, event_id) for deterministic ties. `ts` is
    * epoch nanos (long) — normalized by [[graft.sources.Tables.events]]
    * whatever the parquet layout. */
  def lastWins(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        round(col("value"), 6).as("last_value"),
        expr("ts div 1000000").as("last_ts_ms"))
  }
}

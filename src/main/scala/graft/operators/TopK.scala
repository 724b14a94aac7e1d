package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Window-free exact top-N ranking.
  *
  * A global `row_number()` window (no partition key) forces Spark to
  * move the ENTIRE input relation to one partition — fine on 60k rows,
  * a single-executor chokepoint on a 100 TB corpus (Spark logs
  * "WindowExec: No Partition Defined" for exactly this reason). Every
  * rank-for-top-N use in this engine routes through here instead:
  *
  *   1. `orderBy(...).limit(n)` plans as `TakeOrderedAndProject` — each
  *      partition keeps its local top-n heap and only n-row heads are
  *      merged, so the cluster never concentrates more than n rows.
  *   2. The ≤ n survivors are collapsed into ONE sorted array
  *      (`collect_list` → `sort_array` → `posexplode`) whose position
  *      IS the rank. Bounded by n (callers pass 10–1000), so the
  *      single-row aggregate is O(n) driver-independent work — the
  *      same bound `searchNdcg` has always relied on, minus the
  *      window operator entirely.
  *
  * Ranks are assigned under the total order (scoreCol DESC, idCol ASC);
  * because idCol is unique this is exactly `row_number()` semantics,
  * deterministic and engine-portable. `sort_array` on a struct sorts
  * ascending field-by-field, so the score rides along negated; double
  * negation restores the original value bit-for-bit.
  */
object TopK {

  /** Exact top-`n` of `df` under (scoreCol DESC, idCol ASC) with a
    * 1-based `rankName` column. Output columns: (idCol, scoreCol,
    * rankName). No WindowExec anywhere in the plan. */
  def rankedTopN(df: DataFrame, scoreCol: String, idCol: String, n: Int,
                 rankName: String = "rk"): DataFrame =
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(n)
      .agg(sort_array(collect_list(struct((-col(scoreCol)).as("ns"),
        col(idCol).as("id")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pos", "r")))
      .select(col("r.id").as(idCol), (-col("r.ns")).as(scoreCol),
        (col("pos") + 1).cast("int").as(rankName))
}

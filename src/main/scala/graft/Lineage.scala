package graft

import org.apache.spark.sql.Dataset

/** The engine-wide lineage-cut switch. Iterative operators (graph
  * half-steps, EM rounds, store class profiles, candidate lists) cut
  * lineage on node-sized intermediates; the idiom everywhere is
  * [[LineageOps.cutLineage]], which routes to:
  *
  *   - `localCheckpoint()` (the default): executor-local blocks —
  *     correct and fast on local[n] and on a healthy cluster, but an
  *     executor loss mid-query invalidates its blocks and fails the
  *     query (Spark cannot recompute a truncated lineage);
  *   - `checkpoint()` to RELIABLE storage when the session sets
  *     `spark.graft.reliableCheckpoint=true`: blocks persist to the
  *     checkpoint dir (set `spark.graft.checkpointDir`, or a
  *     tmpdir default for local runs — on a real cluster point it at
  *     DFS), so a lost executor re-reads instead of failing. The
  *     100 TB posture: flip one config, no plan changes — both modes
  *     serve identical rows (spec-pinned), reliable mode just pays
  *     the DFS write.
  */
object Lineage {

  /** Session flag: route lineage cuts to reliable `checkpoint()`. */
  val ReliableFlag = "spark.graft.reliableCheckpoint"

  /** Where reliable checkpoints land (first use sets the Spark
    * checkpoint dir if the session has none). */
  val DirFlag = "spark.graft.checkpointDir"

  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable =
      spark.conf.getOption(ReliableFlag).exists(_.equalsIgnoreCase("true"))
    if (!reliable) ds.localCheckpoint()
    else {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirFlag).getOrElse(
          sys.props("java.io.tmpdir") + "/graft_reliable_ckpt")
        spark.sparkContext.setCheckpointDir(dir)
      }
      ds.checkpoint()
    }
  }

  implicit class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Cut lineage on a node-sized intermediate — see [[Lineage]]. */
    def cutLineage(): Dataset[T] = cut(ds)
  }
}

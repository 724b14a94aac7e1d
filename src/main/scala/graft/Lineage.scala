package graft

import org.apache.spark.sql.Dataset

/** The engine-wide lineage-cut switch. Iterative operators (graph
  * half-steps, EM rounds, store class profiles, candidate lists) cut
  * lineage on node-sized intermediates; the idiom everywhere is
  * [[LineageOps.cutLineage]], which routes to:
  *
  *   - `localCheckpoint(eager = false)` (the default): executor-local
  *     blocks, materialized by the first consuming action rather than
  *     a dedicated job per cut (see [[Lineage.EagerFlag]]) — correct
  *     and fast on local[n] and on a healthy cluster, but an executor
  *     loss mid-query invalidates its blocks and fails the query
  *     (Spark cannot recompute a truncated lineage);
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

  /** Session flag: force EAGER local checkpoints (the pre-r17
    * behavior). Default is LAZY: `localCheckpoint(eager = true)` runs
    * a dedicated materialization job per cut, so a chain of k cuts
    * costs k sequential job barriers before the consuming action even
    * starts; `eager = false` truncates the plan immediately (the
    * Dataset wraps the checkpoint-marked RDD either way) but folds the
    * materialization into the FIRST consuming action —
    * LocalRDDCheckpointData then back-fills any partitions that action
    * skipped, so every partition is still stored after that action and
    * later consumers read blocks exactly as before. Same blocks, same
    * storage level, same reuse semantics; k fewer scheduling barriers
    * per query. The one pattern lazy cuts would break — materializing
    * after the cut's input FILES are deleted — cannot occur here:
    * the only input-deleting flows (DeltaStore.compact / the staged
    * merges) consume every cut relation with a staging WRITE before
    * the delete, and writes materialize checkpoints in full.
    *
    * DETERMINISM PRECONDITION (ADVICE r17): a lazy cut is only exact
    * over a DETERMINISTIC relation. A partial first action (limit /
    * take / short-circuit agg) may materialize only some partitions;
    * the back-fill job recomputes the REST from upstream later, and a
    * nondeterministic upstream (rand(), sample without a pinned seed
    * per partition, unordered limit) could store partitions
    * inconsistent with what the first action observed. Every relation
    * the engine cuts today is deterministic (spec-gated: oracle
    * 430/430); any FUTURE cut over a nondeterministic relation must
    * use an eager cut (or fully materialize first) instead. */
  val EagerFlag = "spark.graft.eagerCut"

  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable =
      spark.conf.getOption(ReliableFlag).exists(_.equalsIgnoreCase("true"))
    if (!reliable) {
      val eager =
        spark.conf.getOption(EagerFlag).exists(_.equalsIgnoreCase("true"))
      ds.localCheckpoint(eager = eager)
    } else {
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

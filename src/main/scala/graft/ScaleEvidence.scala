package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only evidence harness (r17 verdict audit item 4 / r18 task 6):
  * demonstrate that the two "parallelizes naturally at scale" claims
  * hold — stage width follows INPUT LAYOUT, not a hard-coded task
  * count — by re-running the same operators over stores written at
  * ≥ 8 files/partitions and recording the per-stage task histogram.
  *
  *   1. Dedup store maintenance (the q_dedup_merge/compact sorted
  *      staged rewrites): shards built from an 8-partition corpus
  *      hold 8-file relations; the merge's B-side rewrites and the
  *      compaction's full rewrites must show multi-task stages.
  *   2. ANN serve scans (the q_ann_sq single-file-at-bench-SF class):
  *      the same serve over an 8-file embeddings relation must scan
  *      with 8 tasks.
  *
  * Usage: runMain graft.ScaleEvidence <outDir>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (the Bench contract).
  * Not on any bench/verify path — evidence only. */
object ScaleEvidence {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.add((sc.stageInfo.stageId, sc.stageInfo.numTasks)); ()
      }
    })
    def report(name: String)(body: => Unit): String = {
      stages.clear()
      body
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(_._1)
      val multi = ss.count(_._2 > 1)
      val hist = ss.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (w, xs) => s"${xs.size} stages x $w tasks" }.mkString(", ")
      s"$name: ${ss.size} stages ($multi multi-task; max width ${ss.map(_._2).max}) [$hist]"
    }

    val tmp = java.nio.file.Files.createTempDirectory("scale_ev").toString
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += s"ScaleEvidence over $sfDir at local[$cpus] — stage width must follow input layout"

    // ---- 1. dedup store maintenance over 8-partition shards ----
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val cut = docs.agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0) / 2
    val wide = docs.repartition(8)
    graft.operators.DedupStore.build(wide.filter(col("doc_id") <= cut), s"$tmp/a")
    graft.operators.DedupStore.build(wide.filter(col("doc_id") > cut), s"$tmp/b")
    def files(p: String, sub: String): Int = {
      val fs = graft.sources.DeltaStore.fsOf(spark, p)
      graft.sources.DeltaStore.committedDeltas(spark, p)
        .map(x => fs.listStatus(new org.apache.hadoop.fs.Path(s"$x/$sub"))
          .count(_.getPath.getName.endsWith(".parquet"))).sum
    }
    lines += s"shard a relation files: shingles=${files(s"$tmp/a", "shingles")}, " +
      s"bands=${files(s"$tmp/a", "bands")}, members=${files(s"$tmp/a", "members")}"
    lines += report("dedup mergeStores (8-file shards)") {
      graft.operators.DedupStore.mergeStores(spark, s"$tmp/a", s"$tmp/b", s"$tmp/m")
    }
    // compaction = the full sorted staged rewrite of every relation
    graft.operators.DedupStore.delete(
      docs.filter(col("doc_id") % 13 === 1).select("doc_id"), s"$tmp/m", "del-01")
    lines += report("dedup compactDeltas (8-file store, full sorted rewrites)") {
      graft.operators.DedupStore.compactDeltas(spark, s"$tmp/m")
    }

    // ---- 2. ANN serve scan over an 8-file vector relation ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.repartition(8).write.mode("overwrite").parquet(s"$tmp/emb8")
    val emb8 = spark.read.parquet(s"$tmp/emb8")
    lines += report("Ann.sqTopK over 8-file embeddings (q_ann_sq serve class)") {
      graft.operators.Ann.sqTopK(emb8).write.format("noop").mode("overwrite").save()
    }
    lines += report("Ann.sqTopK over the bench single-file embeddings (control)") {
      graft.operators.Ann.sqTopK(emb).write.format("noop").mode("overwrite").save()
    }

    val out = lines.mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/scale_evidence.txt"), out.getBytes("UTF-8"))
    print(out)
    spark.stop()
  }
}

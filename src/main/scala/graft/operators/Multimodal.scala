package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque binary columns with typed metadata beside them. The
  * actual codec work (image decode, resample, frame extraction) is
  * STUBBED with a deterministic fake — media libraries are not in this
  * container — but the Spark-side shape is real: a typed Dataset, a
  * partition-wise decode pass (the shape a vectorized decode batch
  * would take), and schema'd metadata output. At 100 TB this is a pure
  * map stage: no shuffle, decode parallelism = input partitions.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       fingerprint: String, width: Int, height: Int, n_frames: Int)

  /** Documents → opaque binary payloads (the ingest boundary: in a
    * real pipeline this column comes straight from the source). */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB decode: deterministic fake dimensions derived from payload
    * size and id — stands in for a real image/audio/video decoder.
    * Kept partition-wise (mapPartitions) to model batched decoding. */
  def decodeStub(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { b =>
        md.reset()
        val fp = md.digest(b.payload).map("%02x".format(_)).mkString
        val n = b.payload.length.toLong
        val mt = (b.doc_id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaMeta(b.doc_id, mt, n, fp,
          width = (64 + n % 256).toInt,
          height = (64 + b.doc_id % 128).toInt,
          n_frames = (1 + b.doc_id % 8).toInt)
      }
    }
  }

  /** (doc_id, media_type, n_bytes, fingerprint, width, height,
    * n_frames): the metadata table the rest of the engine joins on. */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeStub(spark, asBlobs(docs)).toDF()

  /** (doc_id, frame_idx, frame_bytes, frame_md5): frame sampling —
    * split each payload into n_frames contiguous byte ranges (stands
    * in for video frame extraction; the slicing, schema and per-frame
    * fingerprint plumbing are real). Pure map + explode: partition
    * parallelism = input, no shuffle. */
  def frameSample(spark: SparkSession, docs: DataFrame): DataFrame = {
    val meta = mediaMeta(spark, docs)
      .select(col("doc_id"), col("n_frames"), col("n_bytes"))
    asBlobs(docs).join(meta, "doc_id")
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        posexplode(expr(
          """transform(sequence(0, n_frames - 1),
            |  f -> substring(payload,
            |                 CAST(f * (n_bytes div n_frames) + 1 AS INT),
            |                 CAST(IF(f = n_frames - 1,
            |                         n_bytes - f * (n_bytes div n_frames),
            |                         n_bytes div n_frames) AS INT)))""".stripMargin))
          .as(Seq("frame_idx", "frame_bytes")))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"),
        md5(col("frame_bytes")).as("frame_md5"))
  }

  /** (source, media_type, n_docs, total_bytes, share): the per-source
    * MODALITY MIX — how each provenance slice splits across
    * image/audio/video, with the within-source share: the curation
    * telemetry behind modality quotas (a multimodal training mix is
    * specified per source AND per modality, and this is the table the
    * quota check reads). Metadata-only: payloads never move — one
    * decode-stub pass, one source join, two small rollups. */
  def modalityMix(spark: SparkSession, docs: DataFrame): DataFrame = {
    val meta = mediaMeta(spark, docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "media_type")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("total_bytes"))
    val perSource = meta.groupBy("source").agg(sum("n_docs").as("n_src"))
    meta.join(perSource, "source")
      .select(col("source"), col("media_type"), col("n_docs"), col("total_bytes"),
        round(col("n_docs").cast("double") / col("n_src"), 6).as("share"))
  }

  /** (doc_id, n_bytes, resized_len, resized_md5): nearest-neighbor
    * RESIZE of the opaque payload to a fixed target length — byte i of
    * the output samples byte floor(i·n/target) of the input, the exact
    * 1-D form of nearest-neighbor image scaling (a real resize would
    * decode first; the sampling arithmetic, binary plumbing and
    * fingerprint contract are the engine-side reality). Pure map
    * stage, output size fixed per row regardless of input size —
    * the property that makes resize the normalizing step before
    * fixed-shape batch encoders. */
  def resize(docs: DataFrame, targetLen: Int = 32): DataFrame =
    docs.select(col("doc_id"), col("text"), length(col("text")).as("n_bytes"))
      .withColumn("resized", expr(
        s"""array_join(transform(sequence(0, ${targetLen - 1}),
           |  i -> substring(text, CAST(i * n_bytes DIV $targetLen AS INT) + 1, 1)), '')""".stripMargin))
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        length(col("resized")).cast("long").as("resized_len"),
        md5(col("resized")).as("resized_md5"))

  /** (doc_id, histogram): a REAL feature extractor over the opaque
    * payload — 16-bin byte histogram (the plumbing a learned encoder
    * batch would use: binary in, fixed-width float vector out,
    * partition-wise). */
  def byteHistogram(spark: SparkSession, blobs: DataFrame, bins: Int = 16): DataFrame = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        val h = new Array[Double](bins)
        var i = 0
        while (i < b.payload.length) {
          h(((b.payload(i) & 0xff) * bins) / 256) += 1.0
          i += 1
        }
        val n = math.max(1, b.payload.length).toDouble
        (b.doc_id, h.map(x => math.round(x / n * 10000.0) / 10000.0).toSeq)
      }
    }.toDF("doc_id", "histogram")
  }

  /** (payload_md5, keep_doc_id, n_copies, total_bytes): exact media
    * dedup — the blob-side analogue of [[Dedup.exact]]: byte-identical
    * payloads collapse under their content hash (min doc_id keeps),
    * with the redundant-byte accounting (total_bytes per group) that
    * drives storage reclamation in an image/video corpus. Hashing
    * happens NEXT TO the payload (map stage); only the 16-byte digest
    * + two integers shuffle — the payloads themselves never move,
    * which is the entire point at 100 TB of media. */
  def dedupBlobs(docs: DataFrame): DataFrame =
    asBlobs(docs)
      .select(col("doc_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("payload_md5")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"),
        sum("n_bytes").as("total_bytes"))

  /** (doc_a, doc_b, n_shared, jaccard): NEAR-duplicate media by
    * FRAME-HASH overlap — the shot/segment-level video-dedup shape:
    * payloads slice into frames ([[frameSample]]), each frame carries
    * an exact content hash, and two assets pair when they share
    * frames (re-encodes, trims and concatenations share runs of
    * identical segments even when whole-file hashes differ). Exact and
    * candidates-first: the only join is on frame_md5, so pair volume
    * is bounded by genuinely shared content, never corpus²; frames
    * occurring in more than `maxDf` assets are dropped first (black
    * frames / intros / color bars carry no identity — the postings-cap
    * rule from text retrieval, deterministic and oracle-replayed).
    * Jaccard is exact integer arithmetic over distinct-frame sets.
    * NOTE: a cheaper histogram-LSH variant was probed and rejected —
    * byte histograms over this corpus are too concentrated to bucket
    * (every config left ≥ 15% of all pairs as candidates), while the
    * frame join stays content-bounded. */
  def frameNearDups(spark: SparkSession, docs: DataFrame,
                    maxDf: Int = 100): DataFrame = {
    val fr = frameSample(spark, docs)
      .select(col("doc_id"), col("frame_md5")).distinct()
      .cutLineage()
    val rare = fr.groupBy("frame_md5").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("frame_md5")
    // sizes over the capped relation too: Jaccard ranges over the
    // identity-bearing frames on both sides of the ratio
    val frk = fr.join(rare, "frame_md5")
    val sizes = frk.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    frk.as("a").join(frk.as("b"),
        col("a.frame_md5") === col("b.frame_md5") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nf").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nf").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 4).as("jaccard"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: image/audio/video as opaque `binary` content
 * with typed metadata, plus the feature-extraction plumbing a training-data
 * pipeline needs.
 *
 * The decode step is STUBBED (this container has no image/audio codecs): a
 * deterministic fake derives "features" from the raw bytes. Everything
 * around it — schema, typed Dataset rows, per-partition batch processing,
 * partition sizing — is real and is the part that must survive a 100 TB
 * corpus: decode runs via `mapPartitions` so each task amortizes
 * (stub-)codec setup over a whole batch of rows, the exact shape a Pandas
 * UDF / native codec would plug into, and content stays one opaque binary
 * column so parquet scans of metadata-only queries never read the bytes
 * (column pruning).
 */
object Multimodal {

  /** Typed media row: opaque payload + structured metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      format: String,          // png | jpg | wav | mp4 | ...
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Int,
      content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])   // fixed-size fake embedding

  val FeatureDim = 16

  /**
   * STUB decode/feature-extract: a real deployment replaces the body marked
   * below with a codec call (e.g. JNI decode or an Arrow batch handed to a
   * Python worker). Deterministic fake: 16-bin byte histogram, L1-normalized
   * — exercises the full distributed plumbing (binary column -> per-partition
   * batch -> fixed-width vector) with verifiable output.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> per-partition setup: a real impl opens the codec ONCE here <<<
      rows.map { m =>
        // >>> STUB: replace with real decode of m.content <<<
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < m.content.length) {
          hist((m.content(i) & 0xff) / (256 / FeatureDim)) += 1f
          i += 1
        }
        val total = math.max(1f, m.content.length.toFloat)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          hist.map(_ / total))
      }
    }
  }

  /** STUB resize: metadata-only transform (a real impl re-encodes content). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(width = w, height = h))
  }

  /** STUB frame sampling for video: emits one metadata row per sampled frame
    * index (a real impl would decode frames from content). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int): DataFrame = {
    val df = media.toDF()
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), greatest(col("duration_ms"), lit(0)),
          lit(everyMs))).as("frame_ms"))
  }

  /** Build a deterministic media table from the documents fixture: content =
    * UTF-8 bytes of the text (the opaque-binary stand-in), metadata derived
    * from doc stats. Exercises the real schema end-to-end. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("int").as("duration_ms"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
  }

  /** Metadata-only projection — demonstrates that content bytes are pruned
    * from the scan (check `.explain`: ReadSchema excludes `content`). */
  def metadataSummary(media: Dataset[MediaRow]): DataFrame =
    media.toDF().groupBy("kind", "format")
      .agg(count("*").as("n"),
        sum(col("duration_ms").cast("long")).as("total_ms"))
}

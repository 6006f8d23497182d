package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY S8-S11 re-expressed for Spark).
  *
  * Media travel as opaque `binary` columns with typed metadata; the
  * decode / feature-extract stages are per-partition batch UDF stages —
  * exactly where a real image/audio library (or a GPU model server) plugs
  * in. The container ships no media codecs, so [[StubCodec]] is a
  * clearly-marked deterministic stand-in: it derives pseudo
  * width/height/duration from the content digest. The Spark-side plumbing —
  * schema, batching, partitioning, explode shapes — is real and tested;
  * swapping StubCodec for a JNI/Pandas-style decoder changes no plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** STUB decode — deterministic fake dimensions from the md5 digest.
    * A real deployment replaces this with an actual codec; everything
    * downstream (schema, explode, window ops) is unchanged. */
  object StubCodec {
    /** width/height/duration as Column exprs over the bytes digest (md5 is
      * computable by any engine, so even the stub is oracle-checkable). */
    def width(bytes: Column): Column =
      (conv(substring(md5(bytes), 1, 4), 16, 10).cast("long") % 1920) + 1
    def height(bytes: Column): Column =
      (conv(substring(md5(bytes), 5, 4), 16, 10).cast("long") % 1080) + 1
    def durationSec(bytes: Column): Column =
      (conv(substring(md5(bytes), 9, 4), 16, 10).cast("long") % 600) + 1
  }

  /** Decode stage: attach (pseudo-)decoded metadata columns. */
  def decode(media: DataFrame): DataFrame =
    media
      .withColumn("width", StubCodec.width(col("bytes")))
      .withColumn("height", StubCodec.height(col("bytes")))
      .withColumn("duration_sec",
        when(col("kind").isin("audio", "video"), StubCodec.durationSec(col("bytes"))))

  /** S9 image normalize: the resize decision is plan-side (codegen'd); the
    * actual pixel work would happen in the decode stage. Mirrors the <=256px
    * rule (`ingestion_service.py:1491-1522`). */
  def resizePlan(decoded: DataFrame, maxWidth: Int = 256): DataFrame =
    decoded.withColumn("needs_resize", col("kind") === "image" && col("width") > maxWidth)
      .withColumn("target_width", least(col("width"), lit(maxWidth)))
      .withColumn("target_height",
        when(col("width") > maxWidth,
          greatest((col("height") * maxWidth / col("width")).cast("long"), lit(1)))
          .otherwise(col("height")))

  /** S8/S10 frame sampling: one row per sampled timestamp (video) or page
    * (pdf) — the explode shape every downstream per-frame model stage
    * consumes. fps expressed as one frame every `stepSec`. */
  def sampleFrames(decoded: DataFrame, stepSec: Int = 30): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("media_id"), col("doc_id"),
        posexplode(sequence(lit(0), (col("duration_sec") / stepSec).cast("long")))
          .as(Seq("frame_number", "step")))
      .select(col("media_id"), col("doc_id"), col("frame_number").cast("long").as("frame_number"),
        (col("step") * stepSec).cast("double").as("ts"))
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, plus
  * decode/feature-extract/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested; the actual media DECODE is stubbed behind
  * deterministic fakes (clearly marked below): this container has no
  * image/audio codecs, and on a real cluster the stub body is the only
  * thing that changes (swap the md5-derived fake for a JNI/pandas-UDF
  * decoder with the same signature).
  *
  * Scale design: per-row map work only — no shuffle, no driver
  * involvement; binary payloads stay columnar in parquet and are never
  * collected. Feature vectors are `array<float>` compatible with the
  * similarity-search operators in [[TextOps]] / `DocumentQueries`.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload: byte length, a 64-bit
    * content id, and (STUB) fake dimensions derived deterministically
    * from the length — a real decoder would read the container header
    * instead. */
  def withMediaMeta(df: DataFrame, media: Column, mime: String): DataFrame = {
    val len = length(media).cast("long")
    df.withColumn("mime", lit(mime))
      .withColumn("media_len", len)
      .withColumn("width", len % 64 + 1) // STUB: header parse
      .withColumn("height", len * 7 % 64 + 1) // STUB: header parse
      .withColumn("content_id", substring(md5(media), 1, 16))
  }

  /** STUB decode → fixed-dim feature vector. Deterministic fake:
    * feature i = (md5(hex(payload) ++ "_" ++ i) first 4 hex digits)
    * / 65535 - 0.5. Signature and batch shape match a real embedding
    * UDF (`binary → array<float>`); only the body is fake. */
  def fakeFeatures(media: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (conv(substring(md5(concat(hex(media), lit("_"), i.cast("string"))), 1, 4),
        16, 10).cast("double") / 65535.0 - 0.5).cast("float"))

  /** STUB frame sampling: every `stride`-th byte offset stands in for a
    * frame timestamp; a real implementation emits one row per decoded
    * frame with the same (media row → many frame rows) generator shape. */
  def frameOffsets(media: Column, stride: Int): Column =
    sequence(lit(0L), greatest(length(media).cast("long") - 1, lit(0L)),
      lit(stride.toLong))
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, plus a batched
  * decode/feature-extract stage.
  *
  * The Spark-side shape is real and tested — schema, partition-local
  * batching, deterministic output — while the actual media decode is a
  * STUB (this container has no image/audio codecs): `decodeStub`
  * derives a fake feature vector from the payload bytes' md5. Swapping
  * in a real decoder (JNI/ONNX/whatever) only replaces the function
  * body; the batching and schema contract stay.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
      n_bytes: Int)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      features: Array[Float])

  /** Wrap a text table into a media-shaped frame: payload = utf-8 bytes
    * (stand-in for image bytes), metadata struct alongside.
    */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(encode(col("text"), "utf-8")).as("n_bytes"),
        col("lang").as("tag")).as("meta"))

  /** STUB media decode: a real implementation would decode the payload
    * (image/audio frame) and run feature extraction; here the "features"
    * are 4 floats derived deterministically from the payload md5 so the
    * pipeline is testable end-to-end. Processes each partition in
    * batches of `batchSize` rows — the shape a vectorized model server
    * (or Arrow batch) wants.
    */
  def decodeStub(spark: SparkSession, media: DataFrame,
      batchSize: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one "model call" per batch — the batched shape is the point
          batch.map { r =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(r.payload)
            val feats = (0 until 4).map { i =>
              ((md(i * 2) & 0xff) * 256 + (md(i * 2 + 1) & 0xff)) / 65535.0f
            }.toArray
            MediaFeatures(r.doc_id, r.mime, r.n_bytes, feats)
          }
        }
      }
  }

  /** Frame-sample a binary payload: cut it into `frameBytes`-sized
    * frames and keep every `stride`-th (video every-kth-frame
    * sampling, audio windowing). Pure Column arithmetic over
    * sequence/filter/substring — no UDF, no shuffle, and
    * engine-reproducible (the oracle slices the same byte ranges).
    * A real resize/transcode step would consume these frames through
    * the same batched mapPartitions shape as [[decodeStub]].
    */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameBytes: Int,
      stride: Int): org.apache.spark.sql.Column = {
    require(frameBytes > 0 && stride > 0,
      s"frameBytes=$frameBytes and stride=$stride must be positive")
    val n = ceil(length(payload) / lit(frameBytes.toDouble)).cast("int")
    val idx = filter(sequence(lit(0), n - 1), i => i % stride === 0)
    // n = 0 would make sequence(0, -1) DESCEND; guard to empty
    when(n > 0,
      transform(idx, i => substring(payload, i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Per-row high-nibble values of the first `sampleBytes` payload
    * bytes, as 1-char hex strings ('0'–'F'). Aggregated corpus-wide
    * this is the byte-distribution screen that catches mistyped or
    * corrupt blobs at ingest (a JPEG corpus whose high-nibble
    * histogram suddenly flattens is not JPEG anymore). Pure hex/
    * substring Column arithmetic — map-side, engine-reproducible.
    */
  def highNibbles(payload: org.apache.spark.sql.Column,
      sampleBytes: Int): org.apache.spark.sql.Column = {
    require(sampleBytes > 0, s"sampleBytes=$sampleBytes must be positive")
    val nb = least(lit(sampleBytes), length(payload))
    when(nb > 0,
      transform(sequence(lit(1), nb),
        i => hex(payload).substr((i - 1) * 2 + 1, lit(1))))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit average-hash (aHash) of a payload's decoded "pixels",
    * emitted as 4 sixteen-bit band values for LSH bucketing: the
    * payload is downsampled into 64 segments, each segment's mean
    * intensity is compared to the global mean (integer
    * cross-multiplication — no division), and the 64 resulting bits
    * pack into 4 bands. Two near-identical payloads differ in a few
    * bits, so candidates meet on an EQUI key (any shared band) and an
    * exact hamming check finishes — the image near-dup shape at scale,
    * identical machinery to the SimHash text path.
    *
    * At the stubbed decode boundary, "pixel intensity" = the char's
    * code point over the first `capChars` chars (a real decoder swaps
    * in grayscale thumbnail pixels; banding/bucketing/verify are
    * unchanged). Backed by the one-pass codegen
    * [[graft.functions.AHashBands]] expression — map-side, no shuffle,
    * engine-reproducible (9.2 s -> sub-second at sf0.1 vs the
    * interpreted higher-order-function formulation it replaced).
    */
  def aHash(df: DataFrame, textCol: String, capChars: Int = 256,
      bandsCol: String = "bands"): DataFrame =
    df.withColumn(bandsCol, org.apache.spark.sql.GraftShim.column(
      graft.functions.AHashBands(
        org.apache.spark.sql.GraftShim.expression(col(textCol)), capChars)))

  /** Wrap text into a REAL binary PGM ("P5") payload: the Netpbm
    * header (`P5\n{w} {h}\n255\n`) followed by `w*h` raw gray bytes —
    * the text's UTF-8 byte stream repeated/truncated to fill the
    * raster. This is the fixture-side stand-in for an image INGEST
    * (real corpora arrive with the payload already binary); what
    * matters is that the payload is a genuine decodable image format,
    * so [[pgmAHash]] exercises an actual header parse + pixel walk.
    * Map-side Column arithmetic only, and byte-reproducible: the
    * oracle replays `byte i = utf8(text)[i mod n_bytes]` without ever
    * constructing the payload.
    */
  def asPgm(text: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val npix = (w * h).cast("int")
    val nb = length(encode(text, "utf-8"))
    val reps = ceil(npix.cast("double") / nb).cast("int")
    val pix = encode(call_function("repeat", text, reps), "utf-8")
      .substr(lit(1), npix)
    concat(
      encode(concat(lit("P5\n"), w.cast("string"), lit(" "),
        h.cast("string"), lit("\n255\n")), "utf-8"),
      pix)
  }

  /** aHash over a DECODED image payload: parse the PGM header, pool
    * the real pixel grid to 8×8 luma, hash — the codegen
    * [[graft.functions.PgmAHashBands]] expression. Same 4-band output
    * contract as [[aHash]]; null for malformed payloads (a corpus
    * scan must survive corrupt blobs).
    */
  def pgmAHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShim.column(
      graft.functions.PgmAHashBands(
        org.apache.spark.sql.GraftShim.expression(payload)))

  /** Oracle-expressible slice of the media pipeline: payload byte
    * length, md5 hex, and metadata projection (no mapPartitions).
    */
  def mediaSummary(documents: DataFrame): DataFrame =
    asMedia(documents).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.tag").as("tag"))
}

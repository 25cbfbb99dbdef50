package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.12): image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by batched
  * per-partition decode operators.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): [[FakeDecoder]] derives deterministic metadata from the
  * payload bytes. Everything around it — schema, batch shape,
  * partition-level iteration, column pruning (metadata-only readers
  * never touch `payload`) — is the real production plumbing. A real
  * deployment swaps `FakeDecoder.decode` for a JNI/FFI codec call; the
  * per-partition batching amortizes codec init exactly like a Pandas
  * UDF's Arrow batches.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, sample_rate: Int, n_frames: Int, checksum: Long)

  /** STUB decoder — deterministic fake standing in for a codec. */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length
      // cheap stable checksum (FNV-1a over bytes)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < n) { h ^= (r.payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      MediaMeta(r.media_id, r.modality, n,
        width = n % 64 * 10 + 32,
        height = n % 48 * 10 + 32,
        sample_rate = if (r.modality == "audio") 16000 else 0,
        n_frames = n % 16 + 1,
        checksum = h)
    }
  }

  /** Wrap a text table as a binary media table (testdata has no real
    * media; production reads payloads from parquet binary columns). */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batched decode: one decoder context per partition, streamed over
    * the rows — the mapPartitions shape a real codec needs. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: init codec once here, close after the iterator drains
      it.map(FakeDecoder.decode)
    }
  }

  /** Frame sampling / resize stub: metadata-level transform showing the
    * pruned-column path (payload is never read). */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): DataFrame =
    meta.toDF().withColumn("sampled_frames",
      greatest(lit(1), (col("n_frames") / everyN).cast("int")))

  /** Resize stub: the payload-level transform — the one step that must
    * READ and REWRITE the binary column (decode/meta paths never do).
    * Deterministic byte decimation stands in for pixel resampling; the
    * shape is the production one: mapPartitions with one resizer
    * context, payload in / smaller payload out, downstream metadata
    * recomputed by [[decodeMeta]] rather than trusted from upstream. */
  def resize(media: Dataset[MediaRecord], targetWidth: Int): Dataset[MediaRecord] = {
    require(targetWidth >= 1, s"targetWidth must be >= 1, got $targetWidth")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: init the resampler once per partition here
      it.map { r =>
        val srcW = r.payload.length % 64 * 10 + 32 // FakeDecoder geometry
        val step = math.max(1, srcW / targetWidth)
        val out = if (step == 1) r.payload
          else r.payload.grouped(step).map(_.head).toArray
        MediaRecord(r.media_id, r.modality, out)
      }
    }
  }

  /** Payload → embedding feature extraction (STUB model: a deterministic
    * `dim`-bin byte histogram, L2-normalized — stands in for a vision/
    * audio encoder). Same mapPartitions shape as [[decodeMeta]]: one
    * model context per partition, batched rows through it. The output
    * `Array[Float]` column drops straight into [[Similarity]]'s ANN
    * path — the multimodal half of the embedding pipeline. */
  def embed(media: Dataset[MediaRecord], dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: load the encoder once per partition here
      it.map { r =>
        val h = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) { h((r.payload(i) & 0xff) % dim) += 1f; i += 1 }
        var ss = 0.0
        var j = 0
        while (j < dim) { ss += h(j) * h(j); j += 1 }
        val n = math.sqrt(ss).toFloat
        if (n > 0) { j = 0; while (j < dim) { h(j) /= n; j += 1 } }
        (r.media_id, h)
      }
    }.toDF("media_id", "embedding")
  }
}

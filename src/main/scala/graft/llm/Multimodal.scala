package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.12): image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by batched
  * per-partition decode operators.
  *
  * The IMAGE path is a real codec: `javax.imageio` (public JDK surface,
  * no extra dependency) decodes PNG/JPEG/GIF/BMP payloads to true
  * width/height/channel stats, and [[resize]] rescales real pixels.
  * Payloads the codec does not recognize (text-as-binary testdata,
  * audio/video containers — no codec ships in the JDK for those) fall
  * back to [[FallbackDecoder]], a deterministic byte-level summarizer,
  * and are labeled `decoder = "fallback"` so downstream consumers can
  * filter on provenance. Everything around the codec — schema, batch
  * shape, partition-level iteration, column pruning (metadata-only
  * readers never touch `payload`) — is the production plumbing; the
  * per-partition batching amortizes codec init exactly like a Pandas
  * UDF's Arrow batches.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, modality: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      n_frames: Int, checksum: Long, decoder: String)

  /** FNV-1a over the payload bytes — cheap stable content checksum
    * shared by both decode paths (exact-dup payloads collide, distinct
    * payloads do not, modulo the 64-bit birthday bound). */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Real image decode via `javax.imageio`. Returns None when no
    * installed reader recognizes the payload (ImageIO sniffs magic
    * bytes before committing to a full decode, so rejecting text
    * payloads is cheap). */
  object ImageDecoder {
    def decode(r: MediaRecord): Option[MediaMeta] = {
      // NonFatal, not just IOException: ImageIO readers throw
      // RuntimeExceptions on sniffable-but-corrupt payloads (bogus
      // header dims, malformed ICC profiles) — one bad image must take
      // the fallback, not fail the task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        MediaMeta(r.media_id, r.modality, r.payload.length,
          width = im.getWidth, height = im.getHeight,
          channels = im.getRaster.getNumBands,
          sample_rate = 0, n_frames = 1,
          checksum = fnv1a(r.payload), decoder = "imageio")
      }
    }
  }

  /** No-codec fallback: deterministic byte-level metadata for payloads
    * no installed codec recognizes. Geometry fields are byte-derived
    * placeholders (flagged by `decoder = "fallback"`), the checksum and
    * size are real. */
  object FallbackDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length
      MediaMeta(r.media_id, r.modality, n,
        width = n % 64 * 10 + 32,
        height = n % 48 * 10 + 32,
        channels = 0,
        sample_rate = if (r.modality == "audio") 16000 else 0,
        n_frames = n % 16 + 1,
        checksum = fnv1a(r.payload),
        decoder = "fallback")
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

  /** Render one tiny real PNG: a deterministic per-id pixel pattern at
    * a per-id geometry — REAL image bytes for the codec path, no
    * external fixture files needed. */
  def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 5 + y * 3) % 256).toInt
        val b = ((id * 11 + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A media table of `n` real PNG payloads with varying per-id
    * geometry — the image-modality fixture/demo source. Rendering
    * happens DISTRIBUTED in mapPartitions (each task encodes its own
    * ids), the same shape a production backfill uses to materialize
    * derived media. */
  def syntheticPngs(spark: org.apache.spark.sql.SparkSession, n: Int,
      idOffset: Long = 0L): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRecord(idOffset + id, "image",
          pngBytes(id, w = 4 + (id % 5).toInt, h = 3 + (id % 4).toInt))
      }
    }
  }

  /** Batched decode: one decoder context per partition, streamed over
    * the rows. Tries the real `javax.imageio` codec first; payloads no
    * reader recognizes take the byte-level fallback. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init: disable ImageIO's disk cache so
      // decodes stay in-memory on executors (no scratch-dir writes)
      javax.imageio.ImageIO.setUseCache(false)
      it.map(r => ImageDecoder.decode(r).getOrElse(FallbackDecoder.decode(r)))
    }
  }

  /** Frame sampling: metadata-level transform showing the
    * pruned-column path (payload is never read). */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): DataFrame =
    meta.toDF().withColumn("sampled_frames",
      greatest(lit(1), (col("n_frames") / everyN).cast("int")))

  /** Payload-level resize — the one step that must READ and REWRITE the
    * binary column (decode/meta paths never do). Payloads the codec
    * recognizes are REALLY resampled: decode → Graphics2D bilinear draw
    * at `targetWidth` (aspect preserved) → PNG re-encode. Unrecognized
    * payloads take a deterministic byte decimation so mixed-modality
    * tables still flow. mapPartitions with one resizer context,
    * payload in / smaller payload out; downstream metadata is
    * recomputed by [[decodeMeta]] rather than trusted from upstream. */
  def resize(media: Dataset[MediaRecord], targetWidth: Int): Dataset[MediaRecord] = {
    require(targetWidth >= 1, s"targetWidth must be >= 1, got $targetWidth")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = // NonFatal: same corrupt-payload tolerance as decode
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null && img.getWidth > targetWidth) {
          val h = math.max(1, img.getHeight * targetWidth / img.getWidth)
          val out = new java.awt.image.BufferedImage(targetWidth, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetWidth, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRecord(r.media_id, r.modality, bos.toByteArray)
        } else if (img != null) {
          r // already at or below target width: pass through untouched
        } else {
          val srcW = r.payload.length % 64 * 10 + 32 // FallbackDecoder geometry
          val step = math.max(1, srcW / targetWidth)
          val out = if (step == 1) r.payload
            else r.payload.grouped(step).map(_.head).toArray
          MediaRecord(r.media_id, r.modality, out)
        }
      }
    }
  }

  /** Payload → embedding feature extraction: a deterministic `dim`-bin
    * byte histogram, L2-normalized — a real (if simple) content
    * feature; swap in a vision/audio encoder model where one is
    * deployed. Same mapPartitions shape as [[decodeMeta]]: one model
    * context per partition, batched rows through it. The output
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

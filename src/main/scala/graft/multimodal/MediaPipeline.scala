package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed multimodal record: media payloads ride through Spark as opaque
  * `binary` columns plus structured metadata — the layout a 100 TB
  * training-data pipeline uses (decode happens in the pipeline, never in
  * the storage layer).
  */
final case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
final case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
final case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long, digest: String, features: Array[Float])
final case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, bytes: Array[Byte])

/** Batch decode boundary. A real deployment plugs an image/audio/video
  * codec in here (JNI/FFI libs — NOT present in this container, hence the
  * deterministic fake below); everything around it — schema, encoders,
  * partitioning, batch shape — is the real Spark plumbing and is tested.
  */
trait MediaDecoder extends Serializable {
  /** Decode a batch of payloads into fixed-width feature vectors. Called
    * with at most `batchSize` records at a time (vectorization unit). */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[Array[Float]]
}

/** Deterministic stand-in: features derived from an md5 stream over the
  * payload — stable across runs/JVMs, so tests can assert exact values. */
final class DeterministicFakeDecoder(dim: Int = 8) extends MediaDecoder {
  override def decodeBatch(batch: Seq[MediaRecord]): Seq[Array[Float]] =
    batch.map { r =>
      val d = MediaPipeline.md5(r.bytes)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff) - 128) / 128.0f)
    }
}

/** Multimodal operators. All run as `mapPartitions` over the typed
  * Dataset — the Scala analog of `mapInPandas`: per-partition iteration
  * grouped into fixed-size batches so a vectorized decoder amortizes
  * setup, with nothing materialized beyond one batch (bounded memory per
  * task at any scale).
  */
object MediaPipeline {

  implicit val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  // One reused digest per task thread — getInstance() per row is a
  // provider lookup + allocation on the hot decode path.
  private val md5Digest =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private[multimodal] def md5(b: Array[Byte]): Array[Byte] = {
    val d = md5Digest.get(); d.reset(); d.digest(b)
  }

  private def hex(b: Array[Byte]): String =
    md5(b).map("%02x".format(_)).mkString

  /** Decode + feature-extract in batches of `batchSize` per partition. */
  def decodeAndExtract(
      ds: Dataset[MediaRecord],
      decoder: MediaDecoder = new DeterministicFakeDecoder(),
      batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch)
        // a decoder returning the wrong count must fail loudly here —
        // lazyZip would silently truncate (= drop records) instead
        require(feats.length == batch.length,
          s"decoder returned ${feats.length} vectors for ${batch.length} records")
        batch.lazyZip(feats).map { (r, f) =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, hex(r.bytes), f)
        }
      }
    }

  /** Resize stub: real codecs would transcode; the deterministic fake
    * truncates/zero-pads the payload to the target byte budget and
    * rewrites the metadata. The Spark shape (map, metadata update) is what
    * a real resize uses. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize target ${w}x$h out of range") // Int overflow -> negative/zero budget
    ds.map { r =>
      val budget = w * h
      val out = java.util.Arrays.copyOf(r.bytes, budget)
      r.copy(bytes = out, meta = r.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling: one frame every `everyMs` of the declared duration —
    * a flatMap that multiplies rows, so at scale it runs AFTER any
    * filtering/dedup, never before. Fake frame payload = deterministic
    * slice of the source bytes. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    ds.filter(_.kind == "video").flatMap { r =>
      // clamp BEFORE narrowing: a huge duration/interval ratio must cap at
      // Int.MaxValue frames, not wrap .toInt negative and emit zero
      val n = math.min(math.max(1L, r.meta.durationMs / everyMs), Int.MaxValue.toLong).toInt
      (0 until n).map { i =>
        val off = i * everyMs
        val start = if (r.bytes.isEmpty) 0 else (off % math.max(1, r.bytes.length)).toInt
        val len = math.min(16, r.bytes.length - start)
        Frame(r.media_id, i, off, r.bytes.slice(start, start + math.max(0, len)))
      }
    }
  }
}

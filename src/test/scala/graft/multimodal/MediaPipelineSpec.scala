package graft.multimodal

import graft.SparkSpec

/** The multimodal plumbing must be deterministic and batch-shaped: the
  * decoder sees at most `batchSize` records per call, features are stable
  * across runs, and frame sampling multiplies rows by declared duration.
  */
class MediaPipelineSpec extends SparkSpec {

  import MediaPipeline._

  private def rec(id: Long, payload: String, kind: String = "image",
      durationMs: Long = 0L): MediaRecord =
    MediaRecord(id, kind, payload.getBytes("UTF-8"), MediaMeta(4, 4, durationMs, "fake"))

  test("decodeAndExtract: deterministic features, correct digest and byte count") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(Seq(rec(1, "hello"), rec(2, "world")))
    val out = MediaPipeline.decodeAndExtract(ds).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out(0).n_bytes === 5L)
    assert(out(0).digest === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(out(0).features.length === 8)
    // determinism: same input -> identical floats
    val again = MediaPipeline.decodeAndExtract(ds).collect().sortBy(_.media_id)
    assert(out(0).features.toSeq === again(0).features.toSeq)
  }

  test("decoder is invoked with at-most-batchSize groups (vectorized shape)") {
    val s = spark
    import s.implicits._
    val sizes = s.sparkContext.collectionAccumulator[Int]("batchSizes")
    val counting = new MediaDecoder {
      private val inner = new DeterministicFakeDecoder()
      override def decodeBatch(b: Seq[MediaRecord]): Seq[Array[Float]] = {
        sizes.add(b.size); inner.decodeBatch(b)
      }
    }
    val ds = s.createDataset((1L to 50L).map(i => rec(i, s"payload-$i"))).repartition(2)
    MediaPipeline.decodeAndExtract(ds, counting, batchSize = 8).collect()
    import scala.jdk.CollectionConverters._
    val observed = sizes.value.asScala.toList
    assert(observed.sum === 50)
    assert(observed.forall(_ <= 8), s"a decode batch exceeded 8: $observed")
  }

  test("resize rewrites metadata and pads/truncates payload to budget") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(Seq(rec(1, "x" * 100)))
    val out = MediaPipeline.resize(ds, 4, 4).collect().head
    assert(out.meta.width === 4 && out.meta.height === 4)
    assert(out.bytes.length === 16)
  }

  test("sampleFrames emits one frame per interval of declared duration, videos only") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(Seq(
      rec(1, "videopayloadbytes", kind = "video", durationMs = 3500),
      rec(2, "notavideo", kind = "image", durationMs = 9999)))
    val frames = MediaPipeline.sampleFrames(ds, everyMs = 1000).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.media_id === 1L))
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(frames.map(_.offset_ms).toSeq === Seq(0L, 1000L, 2000L))
  }

  test("m_media_neardup pairs a byte-different re-encode of the same content; the exact digest misses it") {
    val s = spark
    import s.implicits._
    // two ENCODINGS of one content: case + whitespace differ, so every
    // byte-level digest differs, but the decode-normalize step maps both
    // to the same signal — the PNG-vs-JPEG-of-one-picture situation
    val original = "The Quick Brown Fox Jumps Over The Lazy Dog And Keeps Running All Day Without Stopping Once"
    val reencode = "the quick  brown fox jumps over the lazy dog and keeps  running all day without stopping once"
    val unrelated = "completely different words about spark shuffles and parquet footers living in another document"
    val dir = java.nio.file.Files.createTempDirectory("media_neardup").toString
    Seq((1L, original, "en", "web", original.length.toLong),
        (2L, reencode, "en", "web", reencode.length.toLong),
        (3L, unrelated, "en", "web", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.SparkEntry.queries("m_media_neardup")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 0L)),
      s"re-encode must pair with its original at hamming 0 and nothing else: $pairs")
    // the exact-digest rung misses exactly this pair — the ladder's point
    val exact = graft.SparkEntry.queries("m_media_dedup")(s, dir)
      .collect()
    assert(exact.isEmpty,
      s"leading-chunk digest should NOT see a re-encode as a duplicate: ${exact.toSeq}")
    // keeper election: the pair collapses to the min-id canonical copy,
    // the unrelated payload needs no election and stays absent
    val groups = graft.SparkEntry.queries("m_media_dedup_groups")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups === Set((1L, 1L), (2L, 1L)),
      s"re-encode group must elect media 1 as keeper: $groups")
  }
}

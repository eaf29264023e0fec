package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val media = MultimodalOps.toMediaDataset(MultimodalOps.packDocuments(docs))

  test("pack: binary content + typed meta, modality deterministic by id") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("image", "audio", "video")(r.modality)))
    assert(rows.forall(r => r.meta.nBytes == r.content.length.toLong))
    val m0 = rows.find(_.doc_id == 0L).get
    assert(m0.modality == "image") // 0 % 3 == 0 → image
  }

  test("decode kernel: per-partition, images only, deterministic dims") {
    val metas = MultimodalOps.decodeImageMeta(media).collect()
    val nImages = media.filter(col("modality") === "image").count()
    assert(metas.length.toLong == nImages)
    assert(metas.forall(m => m.width >= 64 && m.width < 576 && m.channels == 3))
    // determinism: run twice, same result
    val again = MultimodalOps.decodeImageMeta(media).collect()
    assert(metas.map(m => (m.doc_id, m.width, m.height)).sortBy(_._1).toSeq ===
      again.map(m => (m.doc_id, m.width, m.height)).sortBy(_._1).toSeq)
  }

  test("REAL codec kernel: javax.imageio header parse of actual PNGs/JPEGs") {
    import spark.implicits._
    // real image bytes, generated in-test (BufferedImage → PNG/JPEG encode)
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8040)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    def mrow(id: Long, bytes: Array[Byte], modality: String = "image") =
      MediaRow(id, modality, bytes, MediaMeta("img", bytes.length.toLong))
    val rows = Seq(
      mrow(1L, png(320, 240)),
      mrow(2L, png(17, 93)),
      mrow(3L, jpeg(64, 48)),
      mrow(4L, Array[Byte](1, 2, 3, 4)), // not an image → routable sentinel
      mrow(5L, png(10, 10), modality = "audio"), // non-image → filtered out
      // null payload → routable sentinel, never a task failure
      MediaRow(6L, "image", null, MediaMeta("img", 0L)))
    val ds = spark.createDataset(rows)
    val metas = MultimodalOps.decodeImageMetaReal(ds).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas.keySet === Set(1L, 2L, 3L, 4L, 6L))
    assert((metas(6L).width, metas(6L).height, metas(6L).channels, metas(6L).n_bytes)
      === ((-1, -1, 0, 0L)))
    assert((metas(1L).width, metas(1L).height, metas(1L).channels) === ((320, 240, 3)))
    assert((metas(2L).width, metas(2L).height) === ((17, 93)))
    assert((metas(3L).width, metas(3L).height, metas(3L).channels) === ((64, 48, 3)))
    assert((metas(4L).width, metas(4L).height, metas(4L).channels) === ((-1, -1, 0)))
    assert(metas(4L).n_bytes === 4L)
    // same no-Exchange contract as the stub kernel
    val plan = MultimodalOps.decodeImageMetaReal(ds)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange(") && !plan.contains("ShuffleExchange"),
      s"unexpected shuffle in real-decode plan:\n$plan")
  }

  test("decode adds no shuffle: plan has no Exchange") {
    val plan = MultimodalOps.decodeImageMeta(media).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode plan:\n$plan")
  }

  test("feature kernel: fixed dim, deterministic, modality preserved") {
    val f = MultimodalOps.extractFeatures(media, dim = 16).collect()
    assert(f.nonEmpty && f.forall(_.features.length == 16))
    val f2 = MultimodalOps.extractFeatures(media, dim = 16).collect()
    assert(f.sortBy(_.doc_id).zip(f2.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling: every 2nd fixed-size frame of video payloads") {
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(_.frame.length <= 64))
    // per-doc: ceil(ceil(nBytes/64)/2) frames
    val vids = media.filter(col("modality") === "video").collect()
    val expect = vids.map(v => (v.doc_id,
      (0 until (v.content.length + 63) / 64).count(_ % 2 == 0))).toMap
    val got = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(got == expect.filter(_._2 > 0))
  }

  test("REAL WAV codec: synthesize → RIFF decode roundtrip + closed forms") {
    import spark.implicits._
    val wavs = MultimodalOps.packWav(docs)
    val decoded = MultimodalOps.decodeAudioReal(wavs).collect()
      .map(d => d.doc_id -> d).toMap
    assert(decoded.size.toLong == docs.count())
    // every decoded field equals the square wave's closed form
    decoded.values.foreach { d =>
      val id = d.doc_id
      val n = 64 + id % 64
      val amp = 500 + (id * 37) % 15000
      val hp = 2 + id % 9
      assert(d.sample_rate == 8000 + (id % 3) * 4000)
      assert((d.channels, d.bits_per_sample) == ((1L, 16L)))
      assert(d.n_samples == n && d.n_bytes == 44 + 2 * n)
      assert(d.peak_abs == amp, s"id=$id")
      assert(d.sum_sq == n * amp * amp)
      assert(d.zero_crossings == (n - 1) / hp)
      assert(d.duration_us == n * 1000000L / d.sample_rate)
    }
    // the synthesized bytes are REAL wav files: the JDK's own independent
    // reader (javax.sound.sampled) agrees on format and sample count
    val b = MultimodalOps.renderWav(42L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate.toInt == 8000 && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 64 + 42 % 64)
    ais.close()
  }

  test("WAV decode: malformed payloads → sentinel rows, never failures") {
    import spark.implicits._
    val good = MultimodalOps.renderWav(7L)
    val truncated = good.take(20)       // header cut mid-fmt
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val lyingSize = good.clone()        // data chunk claims more than exists
    lyingSize(40) = (lyingSize(40) | 0x7F).toByte; lyingSize(41) = 0x7F.toByte
    val rows = Seq(
      MediaRow(1L, "audio", good, MediaMeta("wav", good.length.toLong)),
      MediaRow(2L, "audio", truncated, MediaMeta("wav", truncated.length.toLong)),
      MediaRow(3L, "audio", badMagic, MediaMeta("wav", badMagic.length.toLong)),
      MediaRow(4L, "audio", lyingSize, MediaMeta("wav", lyingSize.length.toLong)),
      MediaRow(5L, "audio", null, MediaMeta("wav", 0L)),
      MediaRow(6L, "image", good, MediaMeta("wav", good.length.toLong)))
    val out = MultimodalOps.decodeAudioReal(spark.createDataset(rows)).collect()
      .map(d => d.doc_id -> d).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L)) // non-audio filtered
    assert(out(1L).sample_rate > 0 && out(1L).peak_abs > 0)
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id).sample_rate == -1 && out(id).sum_sq == -1, s"id=$id")
    }
    // no shuffle in the kernel plan (same contract as the image kernels)
    val plan = MultimodalOps.decodeAudioReal(spark.createDataset(rows))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange(") && !plan.contains("ShuffleExchange"))
  }

  test("REAL AVI/MJPEG: synthesize → container walk → JPEG frame decode") {
    import spark.implicits._
    val vids = MultimodalOps.packAvi(docs.limit(50))
    val frames = MultimodalOps.sampleFramesReal(vids, everyN = 2).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val nFrames = 4 + id % 9
      assert(fs.map(_.frame_idx).sorted.toSeq ==
        (0L until nFrames by 2).toSeq, s"id=$id")
      fs.foreach { f =>
        assert(f.n_frames == nFrames && f.fps == 5 + id % 5)
        assert(f.width == 16 * (1 + id % 4) && f.height == 16 * (1 + id % 3))
        assert(f.channels == 3)
      }
    }
    // the bytes are a real AVI: an independent RIFF sanity read agrees
    val b = MultimodalOps.renderAviMjpeg(11L)
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") == "AVI ")
    // and each extracted frame region is a standalone JPEG imageio can read
    val one = MultimodalOps.sampleFramesReal(
      spark.createDataset(Seq(MediaRow(11L, "video", b,
        MediaMeta("avi", b.length.toLong)))), everyN = 1).collect()
    assert(one.length == 4 + 11 % 9 && one.forall(_.width == 16 * (1 + 11 % 4)))
  }

  test("AVI decode: malformed containers → sentinel, never failures") {
    import spark.implicits._
    val good = MultimodalOps.renderAviMjpeg(3L)
    val badMagic = good.clone(); badMagic(9) = 'X'.toByte // not 'AVI '
    val truncated = good.take(100)
    val rows = Seq(
      MediaRow(1L, "video", good, MediaMeta("avi", good.length.toLong)),
      MediaRow(2L, "video", badMagic, MediaMeta("avi", badMagic.length.toLong)),
      MediaRow(3L, "video", truncated, MediaMeta("avi", truncated.length.toLong)),
      MediaRow(4L, "video", null, MediaMeta("avi", 0L)),
      MediaRow(5L, "audio", good, MediaMeta("avi", good.length.toLong)))
    val out = MultimodalOps.sampleFramesReal(spark.createDataset(rows))
      .collect().groupBy(_.doc_id)
    assert(out.keySet === Set(1L, 2L, 3L, 4L)) // non-video filtered
    assert(out(1L).forall(f => f.width > 0 && f.fps > 0))
    Seq(2L, 3L, 4L).foreach { id =>
      assert(out(id).length == 1 && out(id).head.frame_idx == -1, s"id=$id")
    }
  }

  test("resize: payload shrinks, meta stays consistent") {
    val r = MultimodalOps.resize(media, factor = 4).collect()
    val orig = media.collect().map(m => m.doc_id -> m.content.length).toMap
    assert(r.forall(m => m.meta.nBytes == m.content.length.toLong))
    assert(r.forall(m => m.content.length == (orig(m.doc_id) + 3) / 4))
  }
}

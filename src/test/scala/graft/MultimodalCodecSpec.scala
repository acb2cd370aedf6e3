package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{AviMjpegCodec, BmpCodec, FakeCodec, ImageCodec, ImageIoCodec, Mp4MetaCodec, VideoCodec, WavCodec}

/** Real-decode gate: the WAV, BMP and imageio (JPEG/PNG) codecs must
  * parse handcrafted, byte-exact container fixtures — not just survive
  * the plumbing. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  /** Encode `pixelsTopDown` via ImageIO into `format` ("png"/"jpg"). */
  private def imageBytes(format: String,
      pixelsTopDown: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixelsTopDown.length
    val w = pixelsTopDown(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixelsTopDown(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** A syntactically valid PNG signature + IHDR (correct CRC) claiming
    * `w`×`h` — no pixel data; the decompression-bomb probe. */
  private def pngHeaderOnly(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val body = ByteBuffer.allocate(17).order(ByteOrder.BIG_ENDIAN)
      .put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // bit depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    val bb = ByteBuffer.allocate(8 + 4 + 17 + 4).order(ByteOrder.BIG_ENDIAN)
    bb.put(sig).putInt(13).put(body).putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Canonical 44-byte-header RIFF/WAVE, PCM 16-bit LE. */
  private def wavBytes(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Uncompressed 24-bpp bottom-up BMP; `pixelsTopDown(y)(x) = (r,g,b)`. */
  private def bmpBytes(pixelsTopDown: Array[Array[(Int, Int, Int)]])
      : Array[Byte] = {
    val h = pixelsTopDown.length
    val w = pixelsTopDown(0).length
    val rowStride = ((w * 3 + 3) / 4) * 4
    val dataLen = rowStride * h
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: file row 0 = image row h-1; BGR order; rows zero-padded
    for (y <- (h - 1) to 0 by -1) {
      val row = new Array[Byte](rowStride)
      for (x <- 0 until w) {
        val (r, g, b) = pixelsTopDown(y)(x)
        row(x * 3) = b.toByte; row(x * 3 + 1) = g.toByte
        row(x * 3 + 2) = r.toByte
      }
      bb.put(row)
    }
    bb.array()
  }

  test("WavCodec decodes a PCM fixture byte-exactly") {
    // stereo 8kHz, 2 frames: L=16384,R=-16384,L=32767,R=0
    val f = WavCodec.decodeToFeatures(
      wavBytes(2, 8000, Array[Short](16384, -16384, 32767, 0)))
    assert(f(0) == 2f && f(1) == 8000f && f(2) == 16f) // ch, rate, bits
    assert(f(3) == 2f) // frames per channel
    assert(f(4) == 2f / 8000f) // duration
    val amps = Seq(16384, -16384, 32767, 0).map(_ / 32768.0)
    assert(math.abs(f(5) - amps.sum / 4) < 1e-6) // mean
    assert(math.abs(f(6) - math.sqrt(amps.map(a => a * a).sum / 4)) < 1e-6)
    assert(math.abs(f(7) - 32767.0 / 32768.0) < 1e-6) // peak
  }

  test("WavCodec rejects non-WAV and truncated payloads as zero vectors") {
    assert(WavCodec.decodeToFeatures("not audio at all".getBytes)
      .forall(_ == 0f))
    val wav = wavBytes(1, 16000, Array[Short](100, 200, 300))
    assert(WavCodec.decodeToFeatures(wav.take(30)).forall(_ == 0f))
    assert(WavCodec.decodeToFeatures(null).forall(_ == 0f))
    // data chunk length pointing past the payload must not be trusted
    val bad = wav.clone()
    bad(40) = 0x7f.toByte // inflate data length field
    assert(WavCodec.decodeToFeatures(bad).forall(_ == 0f))
    // near-Int.MaxValue length would WRAP an int bound check — must
    // still reject (Long-math contract, same as the AVI walk)
    val wrap = wav.clone()
    ByteBuffer.wrap(wrap).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4)
    assert(WavCodec.decodeToFeatures(wrap).forall(_ == 0f))
  }

  test("BmpCodec decodes a 24-bpp fixture byte-exactly") {
    // 3x2 image with known channel sums; width 3 forces row padding
    val px = Array(
      Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)))
    val f = BmpCodec.decodeToFeatures(bmpBytes(px))
    assert(f(0) == 3f && f(1) == 2f && f(2) == 24f)
    val n = 6.0 * 255
    assert(math.abs(f(3) - (255 + 10 + 40 + 70) / n) < 1e-6)
    assert(math.abs(f(4) - (255 + 20 + 50 + 80) / n) < 1e-6)
    assert(math.abs(f(5) - (255 + 30 + 60 + 90) / n) < 1e-6)
  }

  test("BmpCodec rejects compressed/odd-bpp/truncated as zero vectors") {
    val good = bmpBytes(Array(Array((1, 2, 3))))
    assert(BmpCodec.decodeToFeatures(good.take(40)).forall(_ == 0f))
    val compressed = good.clone()
    compressed(30) = 1 // BI_RLE8
    assert(BmpCodec.decodeToFeatures(compressed).forall(_ == 0f))
    assert(BmpCodec.decodeToFeatures("BMnope".getBytes).forall(_ == 0f))
  }

  test("BmpCodec.decodePixels: top-down RGB, bottom-up storage unwound") {
    val px = Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((10, 20, 30), (40, 50, 60)))
    val Some((w, h, rgb)) = BmpCodec.decodePixels(bmpBytes(px))
    assert(w == 2 && h == 2)
    // top-down order: row 0 first, R G B per pixel
    assert(rgb.map(_ & 0xff).toSeq == Seq(
      255, 0, 0, 0, 255, 0, 10, 20, 30, 40, 50, 60))
    assert(BmpCodec.decodePixels("not a bmp".getBytes).isEmpty)
  }

  test("hostile BMP headers reject cleanly: Int.MinValue height, " +
    "width overflow, giant dims") {
    val good = bmpBytes(Array(Array((1, 2, 3))))
    def mutated(off: Int, value: Int): Array[Byte] = {
      val c = good.clone()
      ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN).putInt(off, value)
      c
    }
    // height = Int.MinValue survives math.abs as a negative — must be
    // rejected, not turned into a negative allocation
    val minH = mutated(22, Int.MinValue)
    assert(BmpCodec.decodePixels(minH).isEmpty)
    assert(BmpCodec.decodeToFeatures(minH).forall(_ == 0f))
    // width * bytesPerPx wraps Int to a tiny stride — must be rejected,
    // not walked past the payload end
    val wideW = mutated(18, 0x20000000)
    assert(BmpCodec.decodePixels(wideW).isEmpty)
    assert(BmpCodec.decodeToFeatures(wideW).forall(_ == 0f))
    // dims over the cap
    val bigH = mutated(22, (1 << 16) + 1)
    assert(BmpCodec.decodePixels(bigH).isEmpty)
    // and resizeImages flags all of them instead of crashing the task
    val media = Seq((1L, "image", minH), (2L, "image", wideW),
      (3L, "image", bigH))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val out = Multimodal.resizeImages(media, 2, 2)
      .select($"decoded").collect()
    assert(out.length == 3 && out.forall(!_.getBoolean(0)))
  }

  test("resizeImages: exact nearest-neighbour pixel selection") {
    // 4x4 image whose quadrants have distinct colors; a 2x2 resize must
    // pick the top-left pixel of each quadrant (src = floor(dst*4/2))
    val q = Array((10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 40))
    val px = Array.tabulate(4, 4) { (y, x) =>
      q((y / 2) * 2 + (x / 2))
    }
    val media = Seq((1L, "image", bmpBytes(px.map(_.toArray))),
      (2L, "image", "garbage".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val out = Multimodal.resizeImages(media, 2, 2)
      .select($"media_id", $"decoded", $"thumb").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getAs[Array[Byte]](2)))
      .toMap
    assert(out(1L)._1)
    assert(out(1L)._2.map(_ & 0xff).toSeq == Seq(
      10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40))
    assert(!out(2L)._1 && out(2L)._2.isEmpty)
  }

  test("ImageIoCodec decodes a PNG fixture byte-exactly (lossless)") {
    val px = Array(
      Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)))
    val png = imageBytes("png", px)
    val f = ImageIoCodec.decodeToFeatures(png)
    assert(f(0) == 3f && f(1) == 2f && f(2) == 24f)
    val n = 6.0 * 255
    assert(math.abs(f(3) - (255 + 10 + 40 + 70) / n) < 1e-6)
    assert(math.abs(f(4) - (255 + 20 + 50 + 80) / n) < 1e-6)
    assert(math.abs(f(5) - (255 + 30 + 60 + 90) / n) < 1e-6)
    val Some((w, h, rgb)) = ImageIoCodec.decodePixels(png)
    assert(w == 3 && h == 2)
    assert(rgb.map(_ & 0xff).toSeq == Seq(
      255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 40, 50, 60, 70, 80, 90))
  }

  test("ImageIoCodec decodes JPEG: exact dims, means within lossy ε") {
    val px = Array.tabulate(8, 8)((y, x) => (32 * y, 16 * x, 128))
    val jpg = imageBytes("jpg", px)
    val f = ImageIoCodec.decodeToFeatures(jpg)
    assert(f(0) == 8f && f(1) == 8f)
    val n = 64.0 * 255
    val meanR = px.flatten.map(_._1).sum / n
    val meanG = px.flatten.map(_._2).sum / n
    val meanB = px.flatten.map(_._3).sum / n
    assert(math.abs(f(3) - meanR) < 0.05, s"R ${f(3)} vs $meanR")
    assert(math.abs(f(4) - meanG) < 0.05, s"G ${f(4)} vs $meanG")
    assert(math.abs(f(5) - meanB) < 0.05, s"B ${f(5)} vs $meanB")
  }

  test("ImageIoCodec hardening: truncated, bomb-header, garbage, null") {
    val png = imageBytes("png", Array(Array((1, 2, 3), (4, 5, 6))))
    // truncated mid-IDAT: reader throws internally -> zeros, not a crash
    assert(ImageIoCodec.decodeToFeatures(png.take(png.length / 2))
      .forall(_ == 0f))
    assert(ImageIoCodec.decodePixels(png.take(20)).isEmpty)
    // decompression bomb: a ~50-byte payload claiming 2^15 x 2^15 px
    // (1.07e9 px > MaxPixels) must be rejected at the header parse,
    // BEFORE any pixel allocation
    val bomb = pngHeaderOnly(1 << 15, 1 << 15)
    assert(ImageIoCodec.decodePixels(bomb).isEmpty)
    assert(ImageIoCodec.decodeToFeatures(bomb).forall(_ == 0f))
    assert(ImageIoCodec.decodeToFeatures("not an image".getBytes)
      .forall(_ == 0f))
    assert(ImageIoCodec.decodeToFeatures(null).forall(_ == 0f))
    // a small claimed size with no pixel data: header parses, read(0)
    // throws -> None
    assert(ImageIoCodec.decodePixels(pngHeaderOnly(4, 4)).isEmpty)
  }

  test("ImageCodec dispatch: BMP -> byte parser, PNG -> imageio; " +
    "resizeImages handles PNG payloads") {
    val px = Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((10, 20, 30), (40, 50, 60)))
    val bmp = bmpBytes(px)
    val png = imageBytes("png", px)
    assert(ImageCodec.decodeToFeatures(bmp).toSeq ==
      BmpCodec.decodeToFeatures(bmp).toSeq)
    assert(ImageCodec.decodePixels(png).get._3.toSeq ==
      ImageIoCodec.decodePixels(png).get._3.toSeq)
    // both containers produce the IDENTICAL pixel stream for the same
    // image (PNG is lossless), so the resize output matches byte-exactly
    assert(ImageCodec.decodePixels(bmp).get._3.toSeq ==
      ImageCodec.decodePixels(png).get._3.toSeq)
    val q = Array((10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 40))
    val px4 = Array.tabulate(4, 4)((y, x) => q((y / 2) * 2 + (x / 2)))
    val media = Seq((1L, "image", imageBytes("png", px4.map(_.toArray))))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val out = Multimodal.resizeImages(media, 2, 2)
      .select($"decoded", $"thumb").collect()
    assert(out(0).getBoolean(0))
    assert(out(0).getAs[Array[Byte]](1).map(_ & 0xff).toSeq == Seq(
      10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40))
  }

  /** Minimal RIFF/AVI wrapping MJPEG frames: RIFF("AVI " LIST("movi"
    * "00dc"(jpeg)…)). Real AVIs carry an hdrl LIST too; the parser
    * skips unknown chunks, so the fixture stays minimal. */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val bb = ByteBuffer.allocate(8 + data.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f))
    val list = chunk("LIST", movi)
    val bb = ByteBuffer.allocate(12 + list.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + list.length)
      .put("AVI ".getBytes("US-ASCII")).put(list)
    bb.array()
  }

  test("AviMjpegCodec: extracts MJPEG frames byte-exactly and decodes " +
    "their stats") {
    val px = Array.tabulate(8, 8)((y, x) => (32 * y, 16 * x, 128))
    val jpeg1 = imageBytes("jpg", px)
    val jpeg2 = imageBytes("jpg", px.map(_.map { case (r, g, b) => (b, g, r) }))
    val avi = aviBytes(Seq(jpeg1, jpeg2))
    val fs = AviMjpegCodec.frames(avi)
    assert(fs.length == 2)
    assert(fs(0).toSeq == jpeg1.toSeq && fs(1).toSeq == jpeg2.toSeq)
    val f = AviMjpegCodec.decodeToFeatures(avi)
    assert(f(0) == 2f && f(1) == 2f) // frames, decoded
    assert(f(2) == 8f && f(3) == 8f) // dims from the first frame
    assert(f(7) == 1f) // isMjpeg
    // non-AVI and hostile containers reject cleanly
    assert(AviMjpegCodec.frames("not a video".getBytes).isEmpty)
    assert(AviMjpegCodec.frames(avi.take(20)).isEmpty)
    val hostile = avi.clone()
    // inflate the LIST length beyond the payload: must not over-read
    ByteBuffer.wrap(hostile).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue)
    assert(AviMjpegCodec.frames(hostile).isEmpty)
    assert(AviMjpegCodec.decodeToFeatures(hostile).forall(_ == 0f))
  }

  test("AviMjpegCodec: frames inside 'rec ' grouping LISTs are found") {
    // interleaved muxers wrap each frame group in LIST('rec ') inside
    // LIST('movi') — the walk must descend both levels
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val bb = ByteBuffer.allocate(8 + data.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val jpeg = imageBytes("jpg", Array.tabulate(2, 2)((_, _) => (9, 9, 9)))
    val rec = chunk("LIST",
      "rec ".getBytes("US-ASCII") ++ chunk("00dc", jpeg))
    val movi = "movi".getBytes("US-ASCII") ++ rec
    val list = chunk("LIST", movi)
    val bb = ByteBuffer.allocate(12 + list.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + list.length)
      .put("AVI ".getBytes("US-ASCII")).put(list)
    val fs = AviMjpegCodec.frames(bb.array())
    assert(fs.length == 1 && fs(0).toSeq == jpeg.toSeq)
  }

  test("AviMjpegCodec: sampling spreads over the clip, not its head") {
    // 7 frames, first 4 black, last 3 white; ceil stride samples
    // 0,2,4,6 (2 black + 2 white -> mid-gray mean); a floor stride
    // would sample 0,1,2,3 and report the clip as all-black
    val black = imageBytes("jpg", Array.tabulate(2, 2)((_, _) => (0, 0, 0)))
    val white = imageBytes("jpg",
      Array.tabulate(2, 2)((_, _) => (255, 255, 255)))
    val avi = aviBytes(Seq(black, black, black, black, white, white, white))
    val f = AviMjpegCodec.decodeToFeatures(avi)
    assert(f(0) == 7f && f(1) == 4f) // 7 frames, 4 sampled+decoded
    // ImageIo means are normalized to [0,1]: expect ≈0.5 (2 black +
    // 2 white); an all-black head sample would be ≈0
    assert(f(4) > 0.2f && f(4) < 0.8f,
      s"mean R ${f(4)} — sampling collapsed to the clip head")
  }

  test("VideoCodec dispatch: AVI -> real MJPEG decode, other video -> " +
    "marked stand-in") {
    val jpeg = imageBytes("jpg", Array.tabulate(4, 4)((_, _) => (10, 20, 30)))
    val avi = aviBytes(Seq(jpeg))
    val real = VideoCodec.decodeToFeatures(avi)
    assert(real(0) == 1f && real(7) == 1f) // AviMjpeg features, padded
    assert(real.length == FakeCodec.featureDim)
    val fake = VideoCodec.decodeToFeatures("mp4 bytes".getBytes)
    assert(fake.toSeq ==
      FakeCodec.decodeToFeatures("mp4 bytes".getBytes).toSeq)
  }

  test("sampleMjpegFrames explodes real frames; each feeds the image " +
    "pipeline") {
    val px4 = Array.tabulate(4, 4)((_, _) => (200, 100, 50))
    val jpegs = (0 until 3).map(_ => imageBytes("jpg", px4))
    val media = Seq(
      (1L, "video", aviBytes(jpegs)),
      (2L, "video", "no container".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val frames = Multimodal.sampleMjpegFrames(media).collect()
    assert(frames.length == 3)
    assert(frames.forall(_.getLong(0) == 1L)) // non-AVI emitted nothing
    // every exploded frame decodes as an image
    frames.foreach { r =>
      val feat = graft.operators.Multimodal.ImageCodec
        .decodeToFeatures(r.getAs[Array[Byte]](2))
      assert(feat(0) == 4f && feat(1) == 4f)
    }
    // stride sampling
    assert(Multimodal.sampleMjpegFrames(media, stride = 2)
      .collect().map(_.getInt(1)).toSeq.sorted == Seq(0, 2))
  }

  // ---- MP4 / ISO-BMFF fixtures (big-endian box tree, handcrafted) ----

  private def beBytes(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val bb = ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)
    fill(bb); bb.array()
  }

  private def mp4Box(tp: String, payloads: Array[Byte]*): Array[Byte] = {
    val body = payloads.flatten.toArray
    beBytes(8 + body.length)(
      _.putInt(8 + body.length).put(tp.getBytes("US-ASCII")).put(body))
  }

  private def ftypBox(brand: String = "isom"): Array[Byte] =
    mp4Box("ftyp", brand.getBytes("US-ASCII"), new Array[Byte](4),
      brand.getBytes("US-ASCII"))

  /** mvhd version 0: timescale at +12, 32-bit duration at +16. */
  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] =
    mp4Box("mvhd", beBytes(100) { bb =>
      bb.putInt(0).putInt(0).putInt(0) // version/flags, creation, modified
      bb.putInt(timescale).putInt(duration)
    })

  /** tkhd version 0: 16.16 fixed width/height at +76/+80. */
  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    mp4Box("tkhd", beBytes(84) { bb =>
      bb.putInt(76, w << 16); bb.putInt(80, h << 16)
    })

  private def trakBox(handler: String, w: Int, h: Int, fourcc: String,
      tkhd: Option[Array[Byte]] = None): Array[Byte] =
    mp4Box("trak",
      tkhd.getOrElse(tkhdV0(w, h)),
      mp4Box("mdia",
        mp4Box("hdlr", beBytes(24)(
          _.putInt(0).putInt(0).put(handler.getBytes("US-ASCII")))),
        mp4Box("minf", mp4Box("stbl",
          mp4Box("stsd", beBytes(16)(
            _.putInt(0).putInt(1).putInt(8)
              .put(fourcc.getBytes("US-ASCII"))))))))

  /** 3 s, 600-tick timescale, avc1 640x360 video + mp4a audio track. */
  private def mp4Fixture: Array[Byte] =
    ftypBox() ++ mp4Box("moov",
      mvhdV0(600, 1800),
      trakBox("vide", 640, 360, "avc1"),
      trakBox("soun", 0, 0, "mp4a"))

  test("Mp4MetaCodec parses the handcrafted fixture exactly") {
    val info = Mp4MetaCodec.parse(mp4Fixture).get
    assert(info.majorBrand == "isom")
    assert(info.timescale == 600L)
    assert(info.durationSec == 3.0)
    assert(info.tracks.size == 2)
    val v = info.videoTracks.head
    assert(v.width == 640 && v.height == 360 && v.fourcc == "avc1")
    assert(info.audioTracks.head.fourcc == "mp4a")
    assert(Mp4MetaCodec.decodeToFeatures(mp4Fixture).toSeq ==
      Seq(1f, 3f, 600f, 2f, 1f, 1f, 640f, 360f))
  }

  test("Mp4MetaCodec: version-1 boxes parse at their 64-bit offsets") {
    // mvhd v1: 64-bit creation/modification, timescale at +20,
    // 64-bit duration at +24
    val mvhd1 = mp4Box("mvhd", beBytes(112) { bb =>
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L)
      bb.putInt(1000).putLong(2500L)
    })
    // tkhd v1: width/height pushed from +76 to +88
    val tkhd1 = mp4Box("tkhd", beBytes(96) { bb =>
      bb.putInt(0, 0x01000000)
      bb.putInt(88, 1920 << 16); bb.putInt(92, 1080 << 16)
    })
    val mp4 = ftypBox("iso6") ++ mp4Box("moov", mvhd1,
      trakBox("vide", 0, 0, "hvc1", tkhd = Some(tkhd1)))
    val info = Mp4MetaCodec.parse(mp4).get
    assert(info.majorBrand == "iso6")
    assert(info.durationSec == 2.5)
    val v = info.videoTracks.head
    assert(v.width == 1920 && v.height == 1080 && v.fourcc == "hvc1")
  }

  test("Mp4MetaCodec: size==0 (rest of file) and size==1 (largesize)") {
    // moov as the last top-level box with size field 0 -> to end of file
    val moov = mp4Box("moov", mvhdV0(600, 1200))
    val zeroSized = moov.clone()
    ByteBuffer.wrap(zeroSized).putInt(0, 0)
    val i0 = Mp4MetaCodec.parse(ftypBox() ++ zeroSized).get
    assert(i0.durationSec == 2.0)
    // size==1: real 64-bit largesize after the type
    val large = beBytes(16 + moov.length - 8) { bb =>
      bb.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + moov.length - 8).put(moov.drop(8))
    }
    val i1 = Mp4MetaCodec.parse(ftypBox() ++ large).get
    assert(i1.durationSec == 2.0)
  }

  test("Mp4MetaCodec hardening: truncation, hostile sizes, box bombs") {
    assert(Mp4MetaCodec.parse(null).isEmpty)
    assert(Mp4MetaCodec.parse("not a container".getBytes).isEmpty)
    assert(Mp4MetaCodec.parse(mp4Fixture.take(10)).isEmpty)
    // box size past the payload end must reject, not wrap: 0xFFFFFFFE
    // as u32 exceeds any end-off; near-Int.MaxValue checks Long math
    for (bad <- Seq(0xFFFFFFFE, Int.MaxValue - 4)) {
      val m = mp4Fixture.clone()
      ByteBuffer.wrap(m).putInt(ftypBox().length, bad) // moov size field
      assert(Mp4MetaCodec.parse(m).isEmpty, s"size $bad accepted")
    }
    // hostile negative largesize (top bit set) must reject
    val neg = beBytes(16)(
      _.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(java.lang.Long.MIN_VALUE))
    assert(Mp4MetaCodec.parse(ftypBox() ++ neg).isEmpty)
    // a box bomb (thousands of 8-byte boxes) trips MaxBoxes -> reject
    val free = beBytes(8)(_.putInt(8).put("free".getBytes("US-ASCII")))
    val bomb = ftypBox() ++
      Array.fill(Mp4MetaCodec.MaxBoxes + 1)(free).flatten
    assert(Mp4MetaCodec.parse(bomb).isEmpty)
    // truncated mvhd (too short for its version) -> no timescale -> None
    val shortMvhd = ftypBox() ++
      mp4Box("moov", mp4Box("mvhd", new Array[Byte](8)))
    assert(Mp4MetaCodec.parse(shortMvhd).isEmpty)
  }

  test("VideoCodec dispatch: MP4 -> real container metadata, " +
    "zero-padded; other containers stay FakeCodec") {
    val f = VideoCodec.decodeToFeatures(mp4Fixture)
    assert(f.length == VideoCodec.featureDim)
    assert(f.take(8).toSeq == Seq(1f, 3f, 600f, 2f, 1f, 1f, 640f, 360f))
    assert(f.drop(8).forall(_ == 0f))
    val junk = "mystery container".getBytes
    assert(VideoCodec.decodeToFeatures(junk).toSeq ==
      FakeCodec.decodeToFeatures(junk).toSeq)
  }

  test("mp4Metadata: typed narrow columns, payload dropped") {
    val media = Seq((1L, mp4Fixture), (2L, "not an mp4".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.mp4Metadata(media)
    assert(!out.columns.contains("payload"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    val ok = rows(1L)
    assert(ok.getBoolean(ok.fieldIndex("mp4_ok")))
    assert(ok.getString(ok.fieldIndex("mp4_brand")) == "isom")
    assert(ok.getDouble(ok.fieldIndex("mp4_duration_sec")) == 3.0)
    assert(ok.getInt(ok.fieldIndex("mp4_tracks")) == 2)
    assert(ok.getInt(ok.fieldIndex("mp4_width")) == 640)
    assert(ok.getInt(ok.fieldIndex("mp4_height")) == 360)
    assert(ok.getString(ok.fieldIndex("mp4_fourcc")) == "avc1")
    val bad = rows(2L)
    assert(!bad.getBoolean(bad.fieldIndex("mp4_ok")))
    assert(bad.isNullAt(bad.fieldIndex("mp4_duration_sec")))
  }

  /** JPEG-in-MP4 fixture: a real ImageIO JPEG muxed as sample 0 of a
    * `fourcc` video track, with a correct sample table (stsd + stsz +
    * stco pointing into mdat). Layout: ftyp, mdat(jpeg), moov. */
  private def jpegMp4(jpeg: Array[Byte], fourcc: String = "jpeg",
      stcoOverride: Option[Int] = None,
      co64Override: Option[Long] = None): Array[Byte] = {
    val ftyp = ftypBox()
    val mdatOff = ftyp.length + 8 // first payload byte of mdat
    // chunk-offset box: 64-bit co64 when a co64Override is given
    // (hostile-offset tests), else the ordinary u32 stco
    val chunkOffBox = co64Override match {
      case Some(off64) => mp4Box("co64", beBytes(16)(
        _.putInt(0).putInt(1).putLong(off64)))
      case None => mp4Box("stco", beBytes(12)(
        _.putInt(0).putInt(1).putInt(stcoOverride.getOrElse(mdatOff))))
    }
    val stbl = mp4Box("stbl",
      mp4Box("stsd", beBytes(16)(
        _.putInt(0).putInt(1).putInt(8).put(fourcc.getBytes("US-ASCII")))),
      // stsz: version/flags, uniform sample size, sample count
      mp4Box("stsz", beBytes(12)(
        _.putInt(0).putInt(jpeg.length).putInt(1))),
      chunkOffBox)
    val trak = mp4Box("trak", tkhdV0(4, 4),
      mp4Box("mdia",
        mp4Box("hdlr", beBytes(24)(
          _.putInt(0).putInt(0).put("vide".getBytes("US-ASCII")))),
        mp4Box("minf", stbl)))
    ftyp ++ mp4Box("mdat", jpeg) ++
      mp4Box("moov", mvhdV0(600, 1200), trak)
  }

  /** A spec-built `avcC` payload: version 1, given profile/level, NAL
    * length 4 (lengthSizeMinusOne = 3 under the 6 reserved bits), one
    * SPS + one PPS with 2-byte length prefixes. */
  private def avccPayload(sps: Array[Byte], pps: Array[Byte],
      profile: Int = 100, level: Int = 31): Array[Byte] =
    Array[Byte](1, profile.toByte, 0, level.toByte, 0xff.toByte,
      (0xe0 | 1).toByte, 0, sps.length.toByte) ++ sps ++
      Array[Byte](1, 0, pps.length.toByte) ++ pps

  /** avc1-in-MP4 fixture with a REAL sample table and a full
    * VisualSampleEntry (78-byte body) carrying an `avcC` child box:
    * per-sample stsz sizes, single chunk (absent stsc), stco into
    * mdat. Layout: ftyp, mdat(samples…), moov. */
  private def avc1Mp4(samples: Seq[Array[Byte]],
      avcc: Array[Byte],
      sizesOverride: Option[Seq[Int]] = None): Array[Byte] = {
    val ftyp = ftypBox()
    val mdatOff = ftyp.length + 8
    val sizes = sizesOverride.getOrElse(samples.map(_.length))
    val entry = mp4Box("avc1", new Array[Byte](78), mp4Box("avcC", avcc))
    val stbl = mp4Box("stbl",
      mp4Box("stsd", beBytes(8)(_.putInt(0).putInt(1)) ++ entry),
      mp4Box("stsz", beBytes(12 + 4 * sizes.size) { bb =>
        bb.putInt(0).putInt(0).putInt(sizes.size)
        sizes.foreach(bb.putInt)
      }),
      mp4Box("stco", beBytes(12)(_.putInt(0).putInt(1).putInt(mdatOff))))
    val trak = mp4Box("trak", tkhdV0(640, 360),
      mp4Box("mdia",
        mp4Box("hdlr", beBytes(24)(
          _.putInt(0).putInt(0).put("vide".getBytes("US-ASCII")))),
        mp4Box("minf", stbl)))
    ftyp ++ mp4Box("mdat", samples.flatten.toArray) ++
      mp4Box("moov", mvhdV0(600, 1200), trak)
  }

  test("avc1: sample byte ranges and avcC codec config are REAL " +
    "container structure; only pixel decode remains a stand-in") {
    val sps = Array[Byte](0x67, 0x64, 0x00, 0x1f, 0x11, 0x22)
    val pps = Array[Byte](0x68, 0xee.toByte, 0x3c)
    val s0 = Array.tabulate(37)(i => (i * 7).toByte)
    val s1 = Array.tabulate(53)(i => (i * 3 + 1).toByte)
    val mp4 = avc1Mp4(Seq(s0, s1), avccPayload(sps, pps))
    // codec config parses byte-exactly
    val t = Mp4MetaCodec.parse(mp4).get.videoTracks.head
    assert(t.fourcc == "avc1")
    val c = t.avcc.get
    assert(c.profile == 100 && c.profileCompat == 0 && c.level == 31)
    assert(c.nalLengthSize == 4)
    assert(c.spsCount == 1 && c.ppsCount == 1)
    assert(c.spsBytes.toSeq == sps.toSeq)
    // sample ranges resolve byte-exactly through the chunk-run walk
    val mdatOff = ftypBox().length + 8L
    assert(Mp4MetaCodec.sampleRanges(mp4) ==
      Seq((mdatOff, 37L), (mdatOff + 37L, 53L)))
    // the ranges really do slice the muxed sample bytes back out
    val (off, len) = Mp4MetaCodec.sampleRanges(mp4).head
    assert(java.util.Arrays.copyOfRange(mp4, off.toInt,
      (off + len).toInt).toSeq == s0.toSeq)
    // pixel-decode honesty is unchanged: no JPEG keyframes from avc1
    assert(Mp4MetaCodec.keyframes(mp4).isEmpty)
    // a lying SPS length (runs past the box) rejects the whole config
    val lying = avccPayload(sps, pps).clone()
    lying(7) = 120.toByte // claimed SPS length >> box size
    assert(Mp4MetaCodec.parse(avc1Mp4(Seq(s0), lying)).get
      .videoTracks.head.avcc.isEmpty)
    // a lying sample size (claims bytes past the payload) rejects ALL
    // ranges — including the valid-looking first one (shared contract:
    // a table that lies once is not trusted anywhere)
    val bad = avc1Mp4(Seq(s0, s1), avccPayload(sps, pps),
      sizesOverride = Some(Seq(37, 1 << 26)))
    assert(Mp4MetaCodec.sampleRanges(bad).isEmpty)
  }

  test("mp4FrameRanges: one row per sample with real coordinates and " +
    "codec identity; JPEG tracks carry no avc columns; non-MP4 none") {
    val sps = Array[Byte](0x67, 0x42)
    val pps = Array[Byte](0x68)
    val s0 = Array.tabulate(37)(i => (i * 7).toByte)
    val s1 = Array.tabulate(53)(i => (i * 3 + 1).toByte)
    val jpeg = imageBytes("jpg",
      Array.tabulate(4, 4)((_, _) => (120, 60, 30)))
    val media = Seq(
      (1L, "video", avc1Mp4(Seq(s0, s1), avccPayload(sps, pps))),
      (2L, "video", jpegMp4(jpeg)),
      (3L, "video", "no container".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val collected = Multimodal.mp4FrameRanges(media).collect()
    val rows = collected
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), if (r.isNullAt(5)) -1 else r.getInt(5)))
      .sortBy(r => (r._1, r._2))
    val mdatOff = ftypBox().length + 8L
    assert(rows.toSeq == Seq(
      (1L, 0, mdatOff, 37L, "avc1", 100),
      (1L, 1, mdatOff + 37L, 53L, "avc1", 100),
      (2L, 0, mdatOff, jpeg.length.toLong, "jpeg", -1)))
    // the PIXEL contract (r7 VERDICT ask #6): avc1 samples carry REAL
    // coordinates but a NULL `frame` — no stand-in bytes can ever be
    // mistaken for decoded pixels — while the JPEG sample's `frame`
    // is the muxed bytes, byte-exactly
    val frameIdx = Multimodal.mp4FrameRanges(media).schema
      .fieldIndex("frame")
    val byId = collected.groupBy(_.getLong(0))
    assert(byId(1L).forall(_.isNullAt(frameIdx)),
      "avc1 rows must carry NULL frames (no pure-JVM H.264 decode)")
    assert(byId(2L).head.getAs[Array[Byte]](frameIdx).toSeq ==
      jpeg.toSeq, "JPEG sample frame must be the muxed bytes")
  }

  test("frameDhashes: pixel hashing sees only really-decoded frames — " +
    "an avc1 video contributes ZERO rows") {
    import graft.operators.PerceptualHash
    val sps = Array[Byte](0x67, 0x42)
    val pps = Array[Byte](0x68)
    val s0 = Array.tabulate(37)(i => (i * 7).toByte)
    val jpeg = imageBytes("jpg",
      Array.tabulate(8, 8)((y, x) => (x * 30, y * 30, 120)))
    val media = Seq(
      (1L, "video", avc1Mp4(Seq(s0), avccPayload(sps, pps))),
      (2L, "video", jpegMp4(jpeg)))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val hashes = PerceptualHash.frameDhashes(media).collect()
    assert(hashes.nonEmpty, "JPEG-in-MP4 frame must hash")
    assert(hashes.forall(_.getLong(0) == 2L),
      "an avc1 payload must contribute no pixel hashes")
  }

  test("Mp4MetaCodec.firstKeyframe: JPEG-in-MP4 sample 0 extracted " +
    "byte-exactly; non-JPEG codecs and hostile tables reject") {
    val jpeg = imageBytes("jpg",
      Array.tabulate(4, 4)((_, _) => (120, 60, 30)))
    val kf = Mp4MetaCodec.firstKeyframe(jpegMp4(jpeg))
    assert(kf.isDefined, "keyframe not extracted")
    assert(kf.get.toSeq == jpeg.toSeq,
      "keyframe bytes differ from the muxed JPEG")
    // the extracted frame decodes through the ordinary image pipeline
    val feat = ImageCodec.decodeToFeatures(kf.get)
    assert(feat(0) == 4f && feat(1) == 4f)
    // mjpa samples are JPEGs too — same extraction
    assert(Mp4MetaCodec.firstKeyframe(jpegMp4(jpeg, "mjpa")).isDefined)
    // an avc1 track is honestly un-decoded (no pure-JVM H.264)
    assert(Mp4MetaCodec.firstKeyframe(jpegMp4(jpeg, "avc1")).isEmpty)
    // hostile stco: offset past the payload end must reject, not read
    // out of bounds
    assert(Mp4MetaCodec.firstKeyframe(
      jpegMp4(jpeg, stcoOverride = Some(1 << 28))).isEmpty)
    // offset pointing at non-JPEG bytes (the ftyp header) rejects on
    // the SOI check
    assert(Mp4MetaCodec.firstKeyframe(
      jpegMp4(jpeg, stcoOverride = Some(0))).isEmpty)
    // hostile co64: an offset near Long.MaxValue makes `off + len`
    // wrap negative — the subtraction-based bound must reject it
    // rather than index with a truncated int (ADVICE r6 #1)
    assert(Mp4MetaCodec.firstKeyframe(
      jpegMp4(jpeg, co64Override = Some(Long.MaxValue - 2))).isEmpty)
    // sane co64 still extracts (the 64-bit path is not just rejected)
    assert(Mp4MetaCodec.firstKeyframe(
      jpegMp4(jpeg, co64Override = Some((ftypBox().length + 8).toLong)))
      .exists(_.toSeq == jpeg.toSeq))
    // container metadata still parses for all variants
    assert(Mp4MetaCodec.parse(jpegMp4(jpeg)).get
      .videoTracks.head.fourcc == "jpeg")
  }

  test("sampleMp4Keyframes: one image row per JPEG-in-MP4; H.264 and " +
    "non-MP4 emit nothing") {
    val jpeg = imageBytes("jpg",
      Array.tabulate(4, 4)((_, _) => (10, 200, 90)))
    val media = Seq(
      (1L, "video", jpegMp4(jpeg)),
      (2L, "video", jpegMp4(jpeg, "avc1")),
      (3L, "video", "no container".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val frames = Multimodal.sampleMp4Keyframes(media).collect()
    assert(frames.length == 1 && frames.head.getLong(0) == 1L)
    assert(frames.head.getInt(1) == 0)
    assert(frames.head.getAs[Array[Byte]](2).toSeq == jpeg.toSeq)
  }

  // ---- MKV / EBML fixtures (vint-encoded element tree, handcrafted) ----

  /** EBML vint encoding with an explicit byte width: the value occupies
    * the low `7·width` bits, the marker bit sits at position
    * `8·width − width`. */
  private def ebmlVint(v: Long, width: Int): Array[Byte] = {
    val marked = v | (1L << (7 * width))
    (1 to width).map(i =>
      ((marked >> (8 * (width - i))) & 0xff).toByte).toArray
  }

  /** Minimal vint width that can carry `v` (all-ones reserved). */
  private def ebmlSize(v: Long): Array[Byte] = {
    val width = (1 to 8).find(w => v < (1L << (7 * w)) - 1).get
    ebmlVint(v, width)
  }

  /** One EBML element: raw id bytes (marker retained) + size + body. */
  private def ebml(idBytes: Array[Byte], body: Array[Byte]*): Array[Byte] = {
    val b = body.flatten.toArray
    idBytes ++ ebmlSize(b.length) ++ b
  }

  private def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
  private def ebmlUint(v: Long): Array[Byte] = {
    val w = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (1 to w).map(i => ((v >> (8 * (w - i))) & 0xff).toByte).toArray
  }

  /** webm/matroska fixture: EBML(DocType) + Segment(Info(scale,
    * duration-float), Tracks(video VP9 1280x720, audio Opus)). */
  private def mkvFixture(docType: String = "matroska",
      durationTicks: Double = 2500.0,
      scaleNs: Long = 1000000L): Array[Byte] = {
    val header = ebml(id(0x1A, 0x45, 0xDF, 0xA3),
      ebml(id(0x42, 0x82), docType.getBytes("US-ASCII")))
    val info = ebml(id(0x15, 0x49, 0xA9, 0x66),
      ebml(id(0x2A, 0xD7, 0xB1), ebmlUint(scaleNs)),
      ebml(id(0x44, 0x89), ByteBuffer.allocate(8)
        .order(ByteOrder.BIG_ENDIAN)
        .putDouble(durationTicks).array()))
    val videoTrack = ebml(id(0xAE),
      ebml(id(0x83), ebmlUint(1)),
      ebml(id(0x86), "V_VP9".getBytes("US-ASCII")),
      ebml(id(0xE0),
        ebml(id(0xB0), ebmlUint(1280)),
        ebml(id(0xBA), ebmlUint(720))))
    val audioTrack = ebml(id(0xAE),
      ebml(id(0x83), ebmlUint(2)),
      ebml(id(0x86), "A_OPUS".getBytes("US-ASCII")))
    val tracks = ebml(id(0x16, 0x54, 0xAE, 0x6B), videoTrack, audioTrack)
    header ++ ebml(id(0x18, 0x53, 0x80, 0x67), info, tracks)
  }

  test("MkvMetaCodec parses the handcrafted EBML fixture exactly") {
    import graft.operators.Multimodal.MkvMetaCodec
    val info = MkvMetaCodec.parse(mkvFixture()).get
    assert(info.docType == "matroska")
    assert(info.timestampScaleNs == 1000000L)
    assert(info.durationSec == 2.5) // 2500 ticks x 1e6 ns / 1e9
    assert(info.tracks.size == 2)
    val v = info.videoTracks.head
    assert(v.codecId == "V_VP9" && v.width == 1280 && v.height == 720)
    assert(info.audioTracks.head.codecId == "A_OPUS")
    assert(MkvMetaCodec.decodeToFeatures(mkvFixture()).toSeq ==
      Seq(1f, 2.5f, 1000000f, 2f, 1f, 1f, 1280f, 720f))
    // webm brand, non-default timestamp scale (1 ns ticks)
    val webm = MkvMetaCodec
      .parse(mkvFixture("webm", 5e9, scaleNs = 1L)).get
    assert(webm.docType == "webm" && webm.durationSec == 5.0)
  }

  test("MkvMetaCodec: unknown-size Segment (streamed form) parses to " +
    "the payload end") {
    import graft.operators.Multimodal.MkvMetaCodec
    val full = mkvFixture()
    val header = ebml(id(0x1A, 0x45, 0xDF, 0xA3),
      ebml(id(0x42, 0x82), "matroska".getBytes("US-ASCII")))
    val segBody = full.drop(header.length) match {
      case seg => // strip the Segment's own id+size header
        val idW = 4
        val sizeW = (seg(idW) & 0xff) match {
          case b => 8 - (31 - Integer.numberOfLeadingZeros(b))
        }
        seg.drop(idW + sizeW)
    }
    // size byte 0xFF = unknown (all value bits set, width 1)
    val streamed = header ++ id(0x18, 0x53, 0x80, 0x67) ++
      id(0xFF) ++ segBody
    val info = MkvMetaCodec.parse(streamed).get
    assert(info.durationSec == 2.5 && info.tracks.size == 2)
  }

  test("MkvMetaCodec hardening: truncation, malformed vints, element " +
    "bombs reject; junk stays FakeCodec via dispatch") {
    import graft.operators.Multimodal.MkvMetaCodec
    assert(MkvMetaCodec.parse(null).isEmpty)
    assert(MkvMetaCodec.parse("not ebml".getBytes).isEmpty)
    assert(MkvMetaCodec.parse(mkvFixture().take(9)).isEmpty)
    // zero first byte = vint wider than 8 bytes: malformed
    val zeroVint = id(0x1A, 0x45, 0xDF, 0xA3) ++ id(0x00, 0x00)
    assert(MkvMetaCodec.parse(zeroVint).isEmpty)
    // a size extending past the payload end must reject, not wrap
    val overLong = id(0x1A, 0x45, 0xDF, 0xA3) ++
      ebmlVint((1L << 49) - 7, 7) ++ id(0x42)
    assert(MkvMetaCodec.parse(overLong).isEmpty)
    // element bomb: thousands of tiny elements trips MaxElems
    val tiny = ebml(id(0xEC), Array[Byte]()) // Void element, empty
    val bomb = id(0x1A, 0x45, 0xDF, 0xA3) ++
      ebmlSize((MkvMetaCodec.MaxElems + 1).toLong * tiny.length) ++
      Array.fill(MkvMetaCodec.MaxElems + 1)(tiny).flatten
    assert(MkvMetaCodec.parse(bomb).isEmpty)
    // dispatch: MKV -> metadata features, zero-padded; junk -> stand-in
    val f = VideoCodec.decodeToFeatures(mkvFixture())
    assert(f.length == VideoCodec.featureDim)
    assert(f.take(8).toSeq ==
      Seq(1f, 2.5f, 1000000f, 2f, 1f, 1f, 1280f, 720f))
    assert(f.drop(8).forall(_ == 0f))
  }

  test("MkvMetaCodec: cluster-heavy files parse (halt after metadata); " +
    "9-byte integers reject") {
    import graft.operators.Multimodal.MkvMetaCodec
    // a "3-hour" file: valid metadata followed by far more Cluster
    // elements than MaxElems — the walk must halt after Info+Tracks
    // instead of counting skipped clusters against the bomb cap
    val cluster = ebml(id(0x1F, 0x43, 0xB6, 0x75), Array[Byte](1, 2))
    val many = Array.fill(MkvMetaCodec.MaxElems + 64)(cluster).flatten
    val header = ebml(id(0x1A, 0x45, 0xDF, 0xA3),
      ebml(id(0x42, 0x82), "matroska".getBytes("US-ASCII")))
    val info = ebml(id(0x15, 0x49, 0xA9, 0x66),
      ebml(id(0x2A, 0xD7, 0xB1), ebmlUint(1000000L)),
      ebml(id(0x44, 0x89), ByteBuffer.allocate(8)
        .order(ByteOrder.BIG_ENDIAN).putDouble(2500.0).array()))
    val track = ebml(id(0xAE), ebml(id(0x83), ebmlUint(1)),
      ebml(id(0x86), "V_VP9".getBytes("US-ASCII")))
    val tracks = ebml(id(0x16, 0x54, 0xAE, 0x6B), track)
    val longFile = header ++
      ebml(id(0x18, 0x53, 0x80, 0x67), info, tracks, many)
    val got = MkvMetaCodec.parse(longFile)
    assert(got.isDefined, "cluster-heavy file wrongly rejected")
    assert(got.get.durationSec == 2.5 && got.get.tracks.size == 1)
    // an oversized (9-byte) TimestampScale would overflow the Long
    // accumulator into garbage — must reject, not best-effort
    val badScale = ebml(id(0x15, 0x49, 0xA9, 0x66),
      ebml(id(0x2A, 0xD7, 0xB1), Array.fill(9)(0x7f.toByte)))
    val badFile = header ++ ebml(id(0x18, 0x53, 0x80, 0x67), badScale,
      tracks)
    assert(MkvMetaCodec.parse(badFile).isEmpty,
      "9-byte integer accepted — Long overflow garbage")
  }

  test("mkvMetadata: typed narrow columns, payload dropped") {
    val media = Seq((1L, mkvFixture()), (2L, "not an mkv".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.mkvMetadata(media)
    assert(!out.columns.contains("payload"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    val ok = rows(1L)
    assert(ok.getBoolean(ok.fieldIndex("mkv_ok")))
    assert(ok.getString(ok.fieldIndex("mkv_doctype")) == "matroska")
    assert(ok.getDouble(ok.fieldIndex("mkv_duration_sec")) == 2.5)
    assert(ok.getInt(ok.fieldIndex("mkv_tracks")) == 2)
    assert(ok.getInt(ok.fieldIndex("mkv_width")) == 1280)
    assert(ok.getInt(ok.fieldIndex("mkv_height")) == 720)
    assert(ok.getString(ok.fieldIndex("mkv_codec_id")) == "V_VP9")
    val bad = rows(2L)
    assert(!bad.getBoolean(bad.fieldIndex("mkv_ok")))
    assert(bad.isNullAt(bad.fieldIndex("mkv_duration_sec")))
  }

  test("codec fuzz: no parser throws on arbitrary bytes (poisoned " +
    "blobs must not kill a metadata pass)") {
    import graft.operators.Multimodal.{MkvMetaCodec, Mp4MetaCodec}
    val rnd = new scala.util.Random(20260813)
    val magics = Seq(
      Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), // EBML
      "????ftyp".getBytes("US-ASCII"), // ISO-BMFF (size garbage)
      "RIFF????AVI ".getBytes("US-ASCII"),
      "RIFF????WAVE".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      Array[Byte]())
    (1 to 300).foreach { i =>
      val body = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(body)
      // half the trials lead with a real container magic so the fuzz
      // exercises the parsers' interiors, not just the magic check
      val payload =
        if (i % 2 == 0) magics(rnd.nextInt(magics.size)) ++ body else body
      // must return (None / zero vector), never throw
      Mp4MetaCodec.parse(payload)
      MkvMetaCodec.parse(payload)
      Mp4MetaCodec.firstKeyframe(payload)
      assert(VideoCodec.decodeToFeatures(payload).length ==
        VideoCodec.featureDim)
      assert(WavCodec.decodeToFeatures(payload).length ==
        WavCodec.featureDim)
      assert(ImageCodec.decodeToFeatures(payload).length ==
        ImageCodec.featureDim)
    }
  }

  test("extractFeatures dispatches by kind: real codecs for audio/image") {
    val wav = wavBytes(1, 16000, Array[Short](1000, -1000))
    val bmp = bmpBytes(Array(Array((100, 150, 200))))
    val media = Seq(
      (1L, "audio", wav), (2L, "image", bmp),
      (3L, "video", "raw frames".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val out = Multimodal.extractFeatures(media)
      .select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).length == WavCodec.featureDim && out(1L)(1) == 16000f)
    assert(out(2L).length == BmpCodec.featureDim && out(2L)(0) == 1f)
    assert(out(3L).length == FakeCodec.featureDim) // fallback, marked fake
  }
}

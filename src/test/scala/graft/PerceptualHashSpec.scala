package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, PerceptualHash => P}
import graft.queries.ImageQueryCatalog

/** Perceptual-hash dedup: dHash determinism and invariances through the
  * REAL encode/decode pipeline, banded-LSH pair exactness vs brute
  * force, and the catalog's closed-form contract. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (f(x, y) & 0xff).toByte
      val p = (y * w + x) * 3
      rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
    }
    rgb
  }

  private def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
        ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(w: Int, h: Int, rgb: Array[Byte],
      quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
        ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("encodeBmp24 round-trips byte-exactly through BmpCodec") {
    val w = 18; val h = 16
    val rgb = new Array[Byte](3 * w * h)
    scala.util.Random.setSeed(7L) // deterministic fixture bytes
    scala.util.Random.nextBytes(rgb)
    val decoded = Multimodal.BmpCodec.decodePixels(P.encodeBmp24(w, h, rgb))
    assert(decoded.isDefined)
    val (dw, dh, drgb) = decoded.get
    assert(dw == w && dh == h)
    assert(drgb.toSeq == rgb.toSeq, "pixel round-trip not byte-exact")
  }

  test("dhash64: gradient sign is the bit source — monotone ramp gives " +
    "all-ones; reversed ramp gives zero; exact grid math is pinned") {
    // width 9, height 8: grid == image, no downscale
    val up = grayImage(9, 8)((x, _) => x * 20)
    assert(P.dhash64(9, 8, up) == -1L, "increasing ramp must set all 64 bits")
    val down = grayImage(9, 8)((x, _) => 255 - x * 20)
    assert(P.dhash64(9, 8, down) == 0L, "decreasing ramp must clear all bits")
    // 18x16: each 9x8 cell is an exact 2x2 box average (integer /4)
    val img = grayImage(18, 16)((x, y) => (7 * x + 3 * y) % 256)
    val g = P.grayGrid(18, 16, img, 9, 8)
    val cell = {
      val vs = for (dx <- 0 to 1; dy <- 0 to 1)
        yield (7 * (2 * 3 + dx) + 3 * (2 * 5 + dy)) % 256
      vs.sum / 4
    }
    assert(g(5 * 9 + 3) == cell, "2x2 box average mismatch at cell (3,5)")
  }

  test("dHash invariances through the real codecs: BMP == PNG (lossless), " +
    "uniform brightness shift is identity, mild JPEG moves few bits") {
    val w = 64; val h = 48
    val rgb = grayImage(w, h)((x, y) => ((x * x + 3 * y) / 2 + x * y / 7) % 256)
    val viaBmp = P.dhash64(w, h,
      Multimodal.BmpCodec.decodePixels(P.encodeBmp24(w, h, rgb)).get._3)
    val viaPng = {
      val (pw, ph, prgb) =
        Multimodal.ImageIoCodec.decodePixels(encodePng(w, h, rgb)).get
      P.dhash64(pw, ph, prgb)
    }
    assert(viaBmp == viaPng, "lossless BMP vs PNG must hash identically")
    // +10 brightness: every 2x2 box sum grows by 40, every cell by
    // exactly 10 (integer division distributes over the uniform shift),
    // so every gradient comparison is unchanged
    val brighter = grayImage(w, h)(
      (x, y) => math.min(245, ((x * x + 3 * y) / 2 + x * y / 7) % 246) + 10)
    val rgbCapped = grayImage(w, h)(
      (x, y) => math.min(245, ((x * x + 3 * y) / 2 + x * y / 7) % 246))
    assert(P.dhash64(w, h, brighter) == P.dhash64(w, h, rgbCapped),
      "uniform +10 shift must not change the dHash")
    // JPEG q=0.9 requantises: the hash may move, but only by a few bits
    val (jw, jh, jrgb) = Multimodal.ImageIoCodec
      .decodePixels(encodeJpeg(w, h, rgb, 0.9f)).get
    val dist = P.hamming(viaBmp, P.dhash64(jw, jh, jrgb))
    assert(dist <= 10, s"JPEG q0.9 moved $dist dHash bits (> 10)")
  }

  test("hammingPairs == brute force on a seeded hash population, and " +
    "recall is exact for maxDist < bands") {
    val rnd = new scala.util.Random(42)
    // clustered population: 40 cluster centers, members flip <= 3 bits
    val centers = Array.fill(40)(rnd.nextLong())
    val hashes = (0 until 400).map { i =>
      val c = centers(i % 40)
      val flips = rnd.nextInt(4)
      val h = (0 until flips).foldLeft(c)((a, _) => a ^ (1L << rnd.nextInt(64)))
      (i.toLong, h)
    }
    val df = hashes.toDF("doc_id", "dhash")
    val got = P.hammingPairs(df, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = P.hamming(ha, hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want,
      s"LSH pairs ${got.size} != brute-force ${want.size}")
    assert(want.nonEmpty, "degenerate fixture: no qualifying pairs")
  }

  test("dhashImages: undecodable payloads gate out; catalog pipeline " +
    "produces the closed-form hash and real near-dup clusters") {
    val docs = spark.range(0, 120).select(col("id").as("doc_id"))
    val media = ImageQueryCatalog.syntheticBmp(docs)
    val hashed = P.dhashImages(
      media.unionByName(Seq((999L, "not an image".getBytes))
        .toDF("doc_id", "payload")))
    assert(hashed.filter(!col("decoded")).count() == 1)
    val rows = hashed.filter(col("decoded"))
      .select("doc_id", "dhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 120)
    // closed-form check for one doc: compute the grid by hand
    val id = 17L
    val grid = Array.tabulate(8, 9) { (gy, gx) =>
      (for (dx <- 0 to 1; dy <- 0 to 1)
        yield ImageQueryCatalog.pixelValue(id, 2 * gx + dx, 2 * gy + dy))
        .sum / 4
    }
    var want = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (grid(gy)(gx + 1) > grid(gy)(gx)) want |= 1L << (gy * 8 + gx)
    assert(rows(id) == want, "pipeline hash != closed form")
    // same base image (doc_id % 101), neither bumped -> identical hash
    assert(rows(2L) == rows(103L), "base-bucket exact dups must collide")
    // bumped member stays within hamming 2 of its bucket-mates
    assert(P.hamming(rows(0L), rows(101L)) <= 2,
      "one-pixel bump must move at most 2 bits")
  }

  test("audio fingerprint: WAV round-trip is byte-exact, the " +
    "fingerprint matches the closed form, and gain-ordering " +
    "invariance holds") {
    import graft.queries.ImageQueryCatalog
    // encode -> decode round trip preserves every sample
    val samples = Array.tabulate(650)(t =>
      ImageQueryCatalog.sampleValue(33L, t).toShort)
    val pcm = Multimodal.WavCodec.decodePcm(
      P.encodeWavPcm16(8000, 1, samples))
    assert(pcm.isDefined)
    val (ch, rate, got) = pcm.get
    assert(ch == 1 && rate == 8000 && got.toSeq == samples.toSeq)
    // closed-form fingerprint: exact 10-sample windows, sum compare
    val sums = Array.tabulate(65) { w =>
      (w * 10 until (w + 1) * 10)
        .map(t => math.abs(ImageQueryCatalog.sampleValue(33L, t).toLong))
        .sum
    }
    var want = 0L
    for (i <- 0 until 64) if (sums(i + 1) > sums(i)) want |= 1L << i
    assert(P.audioFingerprint64(samples) == want)
    // doubling every sample preserves mean ORDER -> same fingerprint
    // (doubled means are exactly 2x: sums double, counts unchanged)
    val doubled = samples.map(s => (s * 2).toShort)
    assert(P.audioFingerprint64(doubled) == want,
      "2x gain must not change the energy-gradient fingerprint")
    // catalog pipeline: bump doc (id 0) within hamming 2 of its
    // unbumped base-bucket mate (id 101+11*? share base 0 mod 101...)
    // ids 0 (bumped, base 0) and 202 (unbumped, base 0)
    val docs = Seq(0L, 202L).toDF("doc_id")
    val fps = P.audioFingerprints(ImageQueryCatalog.syntheticWav(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(P.hamming(fps(0L), fps(202L)) <= 2,
      "one-window bump must move at most 2 fingerprint bits")
  }

  test("cross-container video dedup: the same JPEG content muxed in " +
    "MP4 and AVI collides on frame dHashes; videoDupPairs scores " +
    "shared distinct frames") {
    import MediaFixtures._
    val shared = Seq(jpegOf(1), jpegOf(2), jpegOf(3))
    val media = Seq(
      // A: MP4 with frames 1,2,3 (multi-chunk sample table)
      (1L, "video", jpegMp4Multi(shared, samplesPerChunk = 2)),
      // B: AVI with frames 2,3,4 — two shared with A, plus a repeat
      // of frame 2 (must count once, not twice)
      (2L, "video", aviMjpeg(Seq(jpegOf(2), jpegOf(3), jpegOf(4), jpegOf(2)))),
      // C: disjoint content
      (3L, "video", jpegMp4Multi(Seq(jpegOf(8), jpegOf(9)))),
      // D: H.264 — honestly un-decoded, contributes no frames
      (4L, "video", jpegMp4Multi(shared, fourcc = "avc1")))
      .toDF("media_id", "kind", "payload")
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val hashes = P.frameDhashes(media)
    val byVideo = hashes.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(byVideo(1L).size == 3 && byVideo(3L).size == 2)
    assert(!byVideo.contains(4L), "avc1 track must emit no frames")
    // container-independence: MP4 frame 2's hash == AVI frame 2's hash
    assert(byVideo(1L).intersect(byVideo(2L)).size == 2)
    val pairs = P.videoDupPairs(hashes, minShared = 2).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L &&
      pairs.head.getLong(2) == 2L,
      s"unexpected pair row ${pairs.head}")
  }
}

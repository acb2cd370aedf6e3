package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image PERCEPTUAL-HASH dedup: 64-bit difference hash (dHash) over
  * decoded pixels, plus a banded-LSH hamming self-join that finds
  * near-duplicate images without the O(n²) pair scan.
  *
  * Why dHash (gradient hash) and not aHash/pHash-DCT: dHash is integer
  * math end-to-end (no float DCT whose last-bit behavior differs per
  * libm), is invariant under uniform brightness shifts (comparisons of
  * adjacent cells are shift-invariant) and under lossless re-encodes
  * (BMP↔PNG), and degrades by only a few bits under mild JPEG
  * requantisation — exactly the robustness a corpus-dedup pass needs.
  * The reference has no image pipeline at all (its media surface is
  * `Big-Data-Analysis-for-Stock-Market-Data`'s tabular CSV only); this
  * operator is part of the beyond-reference training-data-pipeline
  * surface, sharing the decode stack of [[Multimodal]].
  *
  * Scale shape (100 TB): the hash pass is embarrassingly parallel
  * (one mapPartitions over payload-sized partitions — size them with
  * [[Multimodal.repartitionByBytes]] first); the near-dup join is a
  * shuffle on (band, band-bits) LSH keys — `bands` × n rows of a few
  * bytes each, NOT the images — so the shuffle is metadata-scale. The
  * band join is EXACT for `maxDist < bands` (pigeonhole: ≤ maxDist
  * differing bits cannot touch all `bands` disjoint bands), so unlike
  * MinHash-LSH there is no recall loss to tune away. Popular identical
  * hashes (exact-dup clusters) skew their band buckets by design;
  * candidate pairs are deduped before the exact hamming filter, and AQE
  * skew-join handles the shuffle imbalance.
  */
object PerceptualHash {

  /** dHash grid: GridW+1 × GridH gray cells → GridW × GridH = 64 bits. */
  val GridW = 8
  val GridH = 8

  /** Integer luma, the BT.601-ish weights in exact integer arithmetic:
    * `(299 r + 587 g + 114 b) / 1000`. Weights sum to 1000, so a gray
    * pixel (r = g = b = v) maps to exactly v — the property the
    * closed-form DuckDB oracle twin relies on. */
  def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** Area-average grayscale downscale of a top-down packed RGB buffer
    * ([[Multimodal.ImageCodec.decodePixels]] output) to a `gw`×`gh`
    * integer grid. Box edges are `floor(t·src/g)` (exact integer
    * division); when the source is smaller than the grid a box is
    * widened to ≥ 1 px (overlapping boxes, still deterministic). All
    * accumulation is integer — Long sums, one integer division per
    * cell — so the result is bit-identical on every JVM/arch. */
  def grayGrid(w: Int, h: Int, rgb: Array[Byte], gw: Int, gh: Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var ty = 0
    while (ty < gh) {
      val y0 = math.min((ty.toLong * h / gh).toInt, h - 1)
      val y1 = math.max(((ty + 1).toLong * h / gh).toInt, y0 + 1)
      var tx = 0
      while (tx < gw) {
        val x0 = math.min((tx.toLong * w / gw).toInt, w - 1)
        val x1 = math.max(((tx + 1).toLong * w / gw).toInt, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = (y * w + x) * 3
            sum += luma(rgb(p) & 0xff, rgb(p + 1) & 0xff, rgb(p + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        out(ty * gw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 64-bit dHash of decoded pixels: downscale to a 9×8 gray grid
    * ([[grayGrid]] with `GridW+1` columns), then bit `y·8+x` is set iff
    * `gray(x+1, y) > gray(x, y)` — the horizontal gradient sign. */
  def dhash64(w: Int, h: Int, rgb: Array[Byte]): Long = {
    val g = grayGrid(w, h, rgb, GridW + 1, GridH)
    var bits = 0L
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW) {
        if (g(y * (GridW + 1) + x + 1) > g(y * (GridW + 1) + x))
          bits |= 1L << (y * GridW + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Decode each row's image `payload` (BMP/JPEG/PNG/GIF via
    * [[Multimodal.ImageCodec]]) and append `decoded: boolean` and
    * `dhash: long`; the payload column is DROPPED on output so the
    * downstream dedup join never drags blobs through a shuffle. Same
    * partition-wise batch contract as [[Multimodal.extractFeatures]]
    * (one task per partition; size partitions with
    * [[Multimodal.repartitionByBytes]] first). Undecodable payloads get
    * `decoded = false, dhash = 0` — gate on `decoded`. */
  def dhashImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") ++ Seq(
        StructField("decoded", BooleanType, nullable = false),
        StructField("dhash", LongType, nullable = false)))
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filterNot(_ == payloadIdx)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val px = Multimodal.ImageCodec.decodePixels(
          r.getAs[Array[Byte]](payloadIdx))
        val extra: Seq[Any] = px match {
          case Some((w, h, rgb)) => Seq(true, dhash64(w, h, rgb))
          case None => Seq(false, 0L)
        }
        Row.fromSeq(keepIdx.map(r.get) ++ extra)
      }
    }(encoder)
  }

  /** Near-duplicate pairs `(id_a, id_b, hamming)` with
    * `hamming(dhash_a, dhash_b) <= maxDist`, via banded LSH: split the
    * 64-bit hash into `bands` disjoint bit-bands, self-join on band
    * equality (a shuffle on the tiny (band, bits) key — never O(n²)),
    * dedup candidates, then exact-hamming filter. EXACT (full recall)
    * whenever `maxDist < bands`: ≤ maxDist differing bits leave at
    * least one band untouched, so every qualifying pair collides in
    * some band. `id_a < id_b` canonicalises pairs. */
  def hammingPairs(hashes: DataFrame, idCol: String = "doc_id",
      hashCol: String = "dhash", maxDist: Int = 3,
      bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands $bands must divide 64")
    require(maxDist < bands,
      s"maxDist $maxDist >= bands $bands: band join would lose recall")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = hashes.select(
      col(idCol), col(hashCol),
      explode(array((0 until bands).map { i =>
        struct(lit(i).as("band"),
          (shiftrightunsigned(col(hashCol), i * width)
            .bitwiseAND(lit(mask))).as("bits"))
      }: _*)).as("bv"))
      .select(col(idCol), col(hashCol),
        col("bv.band").as("band"), col("bv.bits").as("bits"))
    val a = banded.select(col(idCol).as("id_a"), col(hashCol).as("h_a"),
      col("band"), col("bits"))
    val b = banded.select(col(idCol).as("id_b"), col(hashCol).as("h_b"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct() // a pair can collide in several bands
      .select(col("id_a"), col("id_b"),
        bitCount64(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** `bit_count` of a 64-bit column (codegen'd builtin). */
  private def bitCount64(c: Column): Column = bit_count(c)

  /** Audio fingerprint windows: 65 consecutive windows → 64 energy
    * gradients, the audio analog of the 9-column dHash grid. */
  val AudioWindows = 65

  /** 64-bit energy-gradient audio fingerprint over 16-bit PCM: split
    * the sample stream into [[AudioWindows]] equal windows (floor
    * boundaries, ≥ 1 sample each), take each window's SUMMED absolute
    * amplitude, and set bit `i` iff window i+1's mean energy exceeds
    * window i's — compared as the cross-multiplication
    * `e(i+1)·c(i) > e(i)·c(i+1)` (BigInt, no division, no rounding),
    * so the comparison is EXACT: integer mean division would round
    * ties differently under a uniform 2× gain. Like dHash, the
    * gradient form is invariant under any positive gain k (both sides
    * of each comparison scale by k) and under container re-muxing
    * (the hash sees PCM, not bytes). Multi-channel streams
    * fingerprint the stored interleave (document mono in; a channel
    * mixdown is the caller's choice). */
  def audioFingerprint64(samples: Array[Short]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val w = AudioWindows
    val sums = new Array[Long](w)
    val counts = new Array[Long](w)
    var i = 0
    while (i < w) {
      val s0 = math.min((i.toLong * n / w).toInt, n - 1)
      val s1 = math.max(((i + 1).toLong * n / w).toInt, s0 + 1)
      var sum = 0L
      var s = s0
      while (s < s1) { sum += math.abs(samples(s).toLong); s += 1 }
      sums(i) = sum
      counts(i) = s1 - s0
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < w - 1) {
      if (BigInt(sums(i + 1)) * counts(i) > BigInt(sums(i)) * counts(i + 1))
        bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Decode each row's WAV `payload` ([[Multimodal.WavCodec]] 16-bit
    * PCM parse) and append `decoded: boolean` and `afp: long` (the
    * [[audioFingerprint64]]); payload dropped on output. Same
    * partition-wise batch contract as [[dhashImages]]; near-dup pairs
    * come from [[hammingPairs]]`(hashes, hashCol = "afp")` — the
    * banded-LSH join is hash-agnostic. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") ++ Seq(
        StructField("decoded", BooleanType, nullable = false),
        StructField("afp", LongType, nullable = false)))
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filterNot(_ == payloadIdx)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val pcm = Multimodal.WavCodec.decodePcm(
          r.getAs[Array[Byte]](payloadIdx))
        val extra: Seq[Any] = pcm match {
          case Some((_, _, samples)) =>
            Seq(true, audioFingerprint64(samples))
          case None => Seq(false, 0L)
        }
        Row.fromSeq(keepIdx.map(r.get) ++ extra)
      }
    }(encoder)
  }

  /** Minimal 16-bit PCM mono/N-channel WAV encoder (44-byte canonical
    * header) — the byte-exact inverse of [[Multimodal.WavCodec]]'s
    * parse, for deterministic synthetic audio in the oracle-checked
    * catalog queries and specs. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"$sampleRate Hz x $channels ch")
    val dataLen = 2 * samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Frame-level dHashes for video payloads `(media_id, frame_idx,
    * dhash)`: every `stride`-th REAL frame of the two honestly
    * JVM-decodable video families — AVI/MJPEG
    * ([[Multimodal.sampleMjpegFrames]]) and JPEG-in-MP4
    * ([[Multimodal.sampleMp4Keyframes]], full sample-table walk) —
    * decoded and hashed. Because the hash is computed on decoded
    * PIXELS, identical content hashes identically across containers
    * (the same JPEG muxed in AVI and MP4 collides), which is what
    * makes cross-container video dedup possible. H.264/H.265/VP9
    * payloads emit no rows. */
  def frameDhashes(media: DataFrame, stride: Int = 1): DataFrame = {
    val frames = Multimodal.sampleMjpegFrames(media, stride)
      .unionByName(Multimodal.sampleMp4Keyframes(media, stride))
    dhashImages(frames.withColumnRenamed("frame", "payload"))
      .filter(col("decoded"))
      .select(col("media_id"), col("frame_idx"), col("dhash"))
  }

  /** Video near-dup pairs by shared frame hashes: `(id_a, id_b,
    * shared_frames)` where the two videos have ≥ `minShared` distinct
    * frame dHashes in common. The join key is the frame HASH (8
    * bytes), never frames — the shuffle is metadata-scale, and videos
    * sharing no content never meet. Repeated identical frames within
    * one video collapse first (`distinct`), so a still slate shared
    * by everything counts once per pair, not quadratically.
    * Materialise `frameHashes` (persist/localCheckpoint) before
    * calling: both join sides derive from it, and without
    * materialisation the frame decode pipeline runs twice. */
  def videoDupPairs(frameHashes: DataFrame, minShared: Int = 1,
      idCol: String = "media_id", hashCol: String = "dhash"): DataFrame = {
    val a = frameHashes.select(col(idCol).as("id_a"),
      col(hashCol).as("h")).distinct()
    val b = frameHashes.select(col(idCol).as("id_b"),
      col(hashCol).as("h")).distinct()
    a.join(b, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** One representative per identical dHash (perceptual exact-dup
    * groups): `(dhash, keep_id = min id, n_dups)`. Hash-groupBy —
    * partial aggregation map-side, shuffle carries one row per
    * distinct hash. */
  def dedupByHash(hashes: DataFrame, idCol: String = "doc_id",
      hashCol: String = "dhash"): DataFrame =
    hashes.groupBy(col(hashCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Minimal 24-bit BMP encoder (BITMAPINFOHEADER, BI_RGB, bottom-up,
    * 4-byte-padded rows) for `rgb` in the decoders' top-down packed
    * layout — the byte-exact inverse of [[Multimodal.BmpCodec]]'s
    * parse, used to materialise deterministic synthetic images in the
    * oracle-checked catalog queries and specs. */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == 3 * w * h,
      s"encodeBmp24: $w x $h with ${rgb.length} rgb bytes")
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putInt(0).putInt(54) // reserved, data offset
      .putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val imgY = h - 1 - fileRow // bottom-up
      var x = 0
      while (x < w) {
        val p = (imgY * w + x) * 3
        bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
        x += 1
      }
      var pad = 3 * w
      while (pad < stride) { bb.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    bb.array()
  }
}

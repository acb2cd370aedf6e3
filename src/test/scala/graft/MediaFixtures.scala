package graft

import java.nio.ByteBuffer

/** Shared handcrafted media-container fixtures for specs that exercise
  * the multi-frame video paths (full-sample-table MP4 keyframes,
  * cross-container video dedup). Single-frame fixtures live privately
  * in `MultimodalCodecSpec`; these builders cover multi-sample layouts
  * (non-uniform stsz, stsc chunk runs, multi-chunk stco). */
object MediaFixtures {

  def beBytes(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val bb = ByteBuffer.allocate(n)
    fill(bb)
    bb.array()
  }

  def mp4Box(tp: String, payloads: Array[Byte]*): Array[Byte] = {
    val body = payloads.flatten.toArray
    beBytes(8 + body.length)(
      _.putInt(8 + body.length).put(tp.getBytes("US-ASCII")).put(body))
  }

  def ftypBox(brand: String = "isom"): Array[Byte] =
    mp4Box("ftyp", brand.getBytes("US-ASCII"), new Array[Byte](4),
      brand.getBytes("US-ASCII"))

  def mvhdV0(timescale: Int, duration: Int): Array[Byte] =
    mp4Box("mvhd", beBytes(100) { bb =>
      bb.putInt(0) // version/flags
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(timescale).putInt(duration)
    })

  def tkhdV0(w: Int, h: Int): Array[Byte] =
    mp4Box("tkhd", beBytes(84) { bb =>
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
    })

  /** A tiny real JPEG whose pixel content varies with `seed` (so
    * distinct seeds give distinct dHashes with overwhelming
    * probability). */
  def jpegOf(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // wrapping quadratic: non-monotone, macroscopically different
      // per seed (a monotone ramp would give every seed the same
      // degenerate all-ones dHash)
      val v = (x * x * (seed + 3) / 2 + y * y * (seed % 5 + 2) +
        (x + y) * seed * 13) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Multi-sample JPEG-in-MP4: `jpegs` become the video track's
    * samples, laid out contiguously in one `mdat` and split into
    * chunks of `samplesPerChunk` (stsc runs + one stco entry per
    * chunk, non-uniform stsz — the general sample-table layout).
    * Layout: ftyp, mdat(all jpegs), moov. */
  def jpegMp4Multi(jpegs: Seq[Array[Byte]], fourcc: String = "jpeg",
      samplesPerChunk: Int = Int.MaxValue,
      uniformStsz: Boolean = false,
      stszSizeOverride: Option[Seq[Int]] = None): Array[Byte] = {
    require(jpegs.nonEmpty)
    val ftyp = ftypBox()
    val mdatPayloadOff = ftyp.length + 8
    val sizes = stszSizeOverride.getOrElse(jpegs.map(_.length))
    val spc = math.min(samplesPerChunk, jpegs.size)
    // chunk start offsets: cumulative over samples, every spc samples
    val sampleOffsets = jpegs.map(_.length).scanLeft(mdatPayloadOff)(_ + _)
    val chunkStarts = sampleOffsets.init.indices.by(spc)
      .map(i => sampleOffsets(i))
    val stsz =
      if (uniformStsz) mp4Box("stsz", beBytes(12)(
        _.putInt(0).putInt(sizes.head).putInt(jpegs.size)))
      else mp4Box("stsz", beBytes(12 + 4 * sizes.size) { bb =>
        bb.putInt(0).putInt(0).putInt(sizes.size)
        sizes.foreach(bb.putInt)
      })
    // stsc: one run when every chunk holds spc samples; a second run
    // for a smaller trailing chunk
    val rem = jpegs.size % spc
    val runs: Seq[(Int, Int)] =
      if (rem == 0 || chunkStarts.size == 1) Seq((1, spc))
      else Seq((1, spc), (chunkStarts.size, rem))
    val stsc = mp4Box("stsc", beBytes(8 + 12 * runs.size) { bb =>
      bb.putInt(0).putInt(runs.size)
      runs.foreach { case (first, n) =>
        bb.putInt(first).putInt(n).putInt(1)
      }
    })
    val stco = mp4Box("stco", beBytes(8 + 4 * chunkStarts.size) { bb =>
      bb.putInt(0).putInt(chunkStarts.size)
      chunkStarts.foreach(bb.putInt)
    })
    val stbl = mp4Box("stbl",
      mp4Box("stsd", beBytes(16)(
        _.putInt(0).putInt(1).putInt(8).put(fourcc.getBytes("US-ASCII")))),
      stsz, stsc, stco)
    val trak = mp4Box("trak", tkhdV0(16, 12),
      mp4Box("mdia",
        mp4Box("hdlr", beBytes(24)(
          _.putInt(0).putInt(0).put("vide".getBytes("US-ASCII")))),
        mp4Box("minf", stbl)))
    ftyp ++ mp4Box("mdat", jpegs.flatten.toArray) ++
      mp4Box("moov", mvhdV0(600, 1200), trak)
  }

  /** Minimal AVI/MJPEG: RIFF('AVI ') with a LIST('movi') of `00dc`
    * JPEG chunks — enough for `AviMjpegCodec.frames`. */
  def aviMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le(n: Int): Array[Byte] =
      ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    val chunks = frames.flatMap { f =>
      val pad = if (f.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      "00dc".getBytes("US-ASCII") ++ le(f.length) ++ f ++ pad
    }.toArray
    val movi = "LIST".getBytes("US-ASCII") ++ le(4 + chunks.length) ++
      "movi".getBytes("US-ASCII") ++ chunks
    "RIFF".getBytes("US-ASCII") ++ le(4 + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ movi
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.Mp4MetaCodec
import MediaFixtures._

/** Full-sample-table JPEG-in-MP4 extraction ([[Mp4MetaCodec.keyframes]]):
  * every layout the stsz/stsc/stco walk must resolve, and the
  * reject-the-whole-payload hardening when the table lies. */
class Mp4KeyframesSpec extends SparkSpec {
  import spark.implicits._

  private val jpegs = (1 to 5).map(jpegOf(_))

  test("single chunk, non-uniform stsz: every sample extracted " +
    "byte-exactly, in order") {
    val got = Mp4MetaCodec.keyframes(jpegMp4Multi(jpegs))
    assert(got.size == 5)
    got.zip(jpegs).foreach { case (g, w) =>
      assert(g.toSeq == w.toSeq, "frame bytes differ")
    }
  }

  test("multi-chunk stsc layout (2 per chunk + remainder) resolves " +
    "every chunk's offsets") {
    val got = Mp4MetaCodec.keyframes(jpegMp4Multi(jpegs, samplesPerChunk = 2))
    assert(got.size == 5, s"got ${got.size} frames")
    got.zip(jpegs).foreach { case (g, w) => assert(g.toSeq == w.toSeq) }
  }

  test("uniform stsz (equal-size samples) walks by the uniform stride") {
    val same = Seq.fill(3)(jpegOf(9))
    val got = Mp4MetaCodec.keyframes(
      jpegMp4Multi(same, uniformStsz = true))
    assert(got.size == 3)
    got.foreach(g => assert(g.toSeq == same.head.toSeq))
  }

  test("a sample table that lies once rejects the WHOLE payload — " +
    "frames before the lie are not returned") {
    // middle sample size inflated past its real extent: sample 2 then
    // starts mid-JPEG (no SOI) or out of bounds
    val sizes = jpegs.map(_.length).updated(1, jpegs(1).length + 7)
    val bad = jpegMp4Multi(jpegs, stszSizeOverride = Some(sizes))
    assert(Mp4MetaCodec.keyframes(bad).isEmpty,
      "lying stsz must reject every frame")
    // non-JPEG codec: no extraction, ever
    assert(Mp4MetaCodec.keyframes(jpegMp4Multi(jpegs, "avc1")).isEmpty)
    // sample 0 still honest under firstKeyframe's own sample-0 path
    assert(Mp4MetaCodec.firstKeyframe(bad).exists(_.toSeq == jpegs.head.toSeq))
  }

  test("maxFrames truncates; sampleMp4Keyframes strides with stable " +
    "frame_idx and feeds the image pipeline") {
    assert(Mp4MetaCodec.keyframes(jpegMp4Multi(jpegs), maxFrames = 2)
      .size == 2)
    val media = Seq((7L, "video", jpegMp4Multi(jpegs)))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.sampleMp4Keyframes(media, stride = 2)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    // each extracted frame decodes as an image
    rows.foreach { r =>
      val f = Multimodal.ImageCodec.decodePixels(r.getAs[Array[Byte]](2))
      assert(f.isDefined && f.get._1 == 16 && f.get._2 == 12)
    }
  }
}

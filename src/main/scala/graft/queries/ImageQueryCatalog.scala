package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.PerceptualHash

import Oracle.table

/** Image perceptual-hash catalog (training-data-pipeline extension):
  * dHash, banded-LSH near-dup pairs, and the dedup decision — each
  * oracle-checked end-to-end THROUGH the real byte pipeline.
  *
  * There are no image payloads in the synthetic testdata, so each query
  * materialises a deterministic gray image per document (pixel value =
  * closed-form integer function of `doc_id`, [[pixelValue]]), encodes
  * it as a real 24-bit BMP ([[PerceptualHash.encodeBmp24]]), and runs
  * the REAL decode → downscale → hash stack
  * ([[graft.operators.Multimodal.BmpCodec]] parse →
  * [[PerceptualHash.dhash64]]). The DuckDB twin computes the same hash
  * directly from the closed form — it never sees BMP bytes — so a
  * hash match proves the encoder, the parser, the integer luma, the
  * area-average downscale and the bit packing are all exact, not just
  * that two copies of the same code agree.
  *
  * Image geometry: [[ImgW]]×[[ImgH]] = 18×16 → the 9×8 dHash grid
  * downscales each cell from an exact 2×2 box, so the oracle's
  * `x//2, y//2` grouping reproduces the box sums exactly. Pixels are
  * gray (r=g=b=v), and the integer luma of gray is the identity
  * ([[PerceptualHash.luma]]), keeping the closed form luma-free.
  *
  * Near-dup structure: images repeat every [[BaseMod]] doc_ids (base =
  * `doc_id % BaseMod` drives the pixels), and every 7th doc bumps one
  * pixel by +3 — a perturbation confined to one 2×2 box, hence ≤ 2
  * dHash bits — so each base bucket is a genuine near-dup cluster with
  * exact (hamming 0) and near (hamming ≤ 2) members. */
object ImageQueryCatalog {

  type Q = (SparkSession, String) => DataFrame

  val ImgW = 18
  val ImgH = 16
  /** Base-image period: ~n/BaseMod docs share a base image per SF. */
  val BaseMod = 101
  /** Every BumpMod-th doc perturbs pixel ([[BumpX]], [[BumpY]]) by +3. */
  val BumpMod = 7
  val BumpX = 5
  val BumpY = 4

  /** Closed-form pixel value, shared by the Spark image synthesis and
    * the generated DuckDB twin: the `(x+1)(y+3)(base+7) + xy` cross
    * terms make the horizontal gradient sign vary with `base` (a pure
    * linear ramp would give every doc the same dHash). */
  def pixelValue(docId: Long, x: Int, y: Int): Int = {
    val base = docId % BaseMod
    val bump =
      if (docId % BumpMod == 0 && x == BumpX && y == BumpY) 3L else 0L
    (((x + 1).toLong * (y + 3) * (base + 7) + x.toLong * y + bump)
      % 256).toInt
  }

  /** `(doc_id, payload)` — one deterministic BMP per document, built
    * partition-wise (no driver loop; the encode is ~900 bytes/row). */
  def syntheticBmp(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val (w, h) = (ImgW, ImgH)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val rgb = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = pixelValue(id, x, y).toByte
            val p = (y * w + x) * 3
            rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
            x += 1
          }
          y += 1
        }
        Row(id, PerceptualHash.encodeBmp24(w, h, rgb))
      }
    }(encoder)
  }

  /** Real-pipeline dHash per document. */
  val qi1Dhash: Q = (s, dir) =>
    PerceptualHash.dhashImages(syntheticBmp(table(s, dir, "documents")))
      .filter(col("decoded"))
      .select(col("doc_id"), col("dhash"))

  /** Banded-LSH near-dup pairs (exact for hamming ≤ 3 by pigeonhole —
    * the oracle's O(n²) scan must agree EXACTLY, pair for pair). The
    * hash projection is materialised ONCE (localCheckpoint, 9 bytes a
    * row) before the self-join — the two join sides alias columns
    * differently, so exchange reuse would not kick in and the whole
    * encode→decode→hash pipeline would run twice (the qt7 pattern;
    * at 100 TB the decode pass dominates, the hash table is tiny). */
  val qi2DhashPairs: Q = (s, dir) =>
    PerceptualHash.hammingPairs(
      qi1Dhash(s, dir).localCheckpoint(),
      idCol = "doc_id", hashCol = "dhash", maxDist = 3, bands = 4)

  /** The dedup decision: one kept representative per identical dHash. */
  val qi3DhashDedup: Q = (s, dir) =>
    PerceptualHash.dedupByHash(qi1Dhash(s, dir))

  // ---------- audio fingerprint (same closed-form oracle pattern) ----

  /** Synthetic-audio geometry: [[AudioN]] samples → the 65 fingerprint
    * windows are exact [[AudioWin]]-sample blocks, so the oracle's
    * `t // AudioWin` grouping reproduces the window sums exactly. */
  val AudioN = 650
  val AudioWin = 10
  /** Every AudioBumpMod-th doc adds +5 to the samples of window 30
    * only — confined to one window, hence ≤ 2 fingerprint bits. */
  val AudioBumpMod = 11
  val AudioBumpLo = 300
  val AudioBumpHi = 310

  /** Closed-form PCM sample, shared by the Spark synthesis and the
    * generated DuckDB twin: a wrapping quadratic in ±2000 (the mod
    * keeps the energy profile non-monotone so fingerprints vary with
    * `base`). */
  def sampleValue(docId: Long, t: Int): Int = {
    val base = docId % BaseMod
    val bump =
      if (docId % AudioBumpMod == 0 && t >= AudioBumpLo && t < AudioBumpHi) 5L
      else 0L
    ((t.toLong * t * (base + 11) + 17L * t * (base % 13)) % 4001L
      - 2000L + bump).toInt
  }

  /** `(doc_id, payload)` — one deterministic mono WAV per document. */
  def syntheticWav(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val n = AudioN
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(n)(t => sampleValue(id, t).toShort)
        Row(id, PerceptualHash.encodeWavPcm16(8000, 1, samples))
      }
    }(encoder)
  }

  /** Real-pipeline audio fingerprint per document (WAV encode →
    * RIFF parse → PCM → energy-gradient hash). */
  val qa1AudioFp: Q = (s, dir) =>
    PerceptualHash.audioFingerprints(syntheticWav(table(s, dir, "documents")))
      .filter(col("decoded"))
      .select(col("doc_id"), col("afp"))

  /** Audio near-dup pairs through the SAME banded-LSH join as images
    * (the operator is hash-agnostic); oracle is the O(n²) scan. Hash
    * projection materialised once before the self-join, as in
    * [[qi2DhashPairs]]. */
  val qa2AudioDupPairs: Q = (s, dir) =>
    PerceptualHash.hammingPairs(
      qa1AudioFp(s, dir).localCheckpoint(),
      idCol = "doc_id", hashCol = "afp", maxDist = 3, bands = 4)

  val defs: Map[String, Q] = Map(
    "qp1_dhash" -> qi1Dhash,
    "qp2_dhash_pairs" -> qi2DhashPairs,
    "qp3_dhash_dedup" -> qi3DhashDedup,
    "qa1_audio_fp" -> qa1AudioFp,
    "qa2_audio_dup_pairs" -> qa2AudioDupPairs)

  // ---------- generated DuckDB twins ----------

  /** The closed-form pixel value as DuckDB SQL (doc alias `d`,
    * pixel coords `x`, `y` in scope). */
  private def pixelSql: String =
    s"""(((x + 1) * (y + 3) * ((d.doc_id % $BaseMod) + 7) + x * y
       |   + CASE WHEN d.doc_id % $BumpMod = 0 AND x = $BumpX
       |          AND y = $BumpY THEN 3 ELSE 0 END) % 256)""".stripMargin

  /** CTEs `grid` (9×8 integer gray cells via the exact 2×2 box sums)
    * and `h` (doc_id, dhash). Bit 63 would overflow a BIGINT sum as
    * `1 << 63`, so it is added as `Long.MinValue` through a MIN — the
    * same two's-complement value Spark's `1L << 63` packs. */
  private def hashCtes: String =
    s"""WITH grid AS (
       |  SELECT d.doc_id, x // 2 AS gx, y // 2 AS gy, SUM($pixelSql) // 4 AS g
       |  FROM documents d, range($ImgW) tx(x), range($ImgH) ty(y)
       |  GROUP BY d.doc_id, x // 2, y // 2),
       |h AS (
       |  SELECT a.doc_id,
       |    (SUM(CASE WHEN b.g > a.g AND a.gy * 8 + a.gx < 63
       |              THEN (1::BIGINT << (a.gy * 8 + a.gx)) ELSE 0 END)
       |     + MIN(CASE WHEN b.g > a.g AND a.gy * 8 + a.gx = 63
       |               THEN -9223372036854775808 ELSE 0 END))::BIGINT AS dhash
       |  FROM grid a JOIN grid b
       |    ON a.doc_id = b.doc_id AND b.gx = a.gx + 1 AND b.gy = a.gy
       |  WHERE a.gx < 8
       |  GROUP BY a.doc_id)""".stripMargin

  /** The closed-form PCM sample as DuckDB SQL (doc alias `d`, sample
    * index `t` in scope) — mirrors [[sampleValue]] exactly. */
  private def audioSampleSql: String =
    s"""((t * t * ((d.doc_id % $BaseMod) + 11) + 17 * t * ((d.doc_id % $BaseMod) % 13)) % 4001
       |   - 2000
       |   + CASE WHEN d.doc_id % $AudioBumpMod = 0 AND t >= $AudioBumpLo
       |          AND t < $AudioBumpHi THEN 5 ELSE 0 END)""".stripMargin

  /** CTEs `am` (per-window summed |sample|, exact [[AudioWin]]-sample
    * blocks — equal counts, so the engine's cross-multiplied mean
    * comparison reduces to comparing sums) and `ah` (doc_id, afp) —
    * bit 63 via the same MIN trick as [[hashCtes]]. */
  private def audioCtes: String =
    s"""WITH am AS (
       |  SELECT d.doc_id, t // $AudioWin AS w,
       |    SUM(ABS($audioSampleSql)) AS m
       |  FROM documents d, range($AudioN) ts(t)
       |  GROUP BY d.doc_id, t // $AudioWin),
       |ah AS (
       |  SELECT a.doc_id,
       |    (SUM(CASE WHEN b.m > a.m AND a.w < 63
       |              THEN (1::BIGINT << a.w) ELSE 0 END)
       |     + MIN(CASE WHEN b.m > a.m AND a.w = 63
       |               THEN -9223372036854775808 ELSE 0 END))::BIGINT AS afp
       |  FROM am a JOIN am b ON a.doc_id = b.doc_id AND b.w = a.w + 1
       |  WHERE a.w < 64
       |  GROUP BY a.doc_id)""".stripMargin

  val sql: Map[String, String] = Map(
    "qp1_dhash" ->
      s"""$hashCtes
         |SELECT doc_id, dhash FROM h""".stripMargin,
    "qp2_dhash_pairs" ->
      s"""$hashCtes
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.dhash, b.dhash))::INT AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin,
    "qp3_dhash_dedup" ->
      s"""$hashCtes
         |SELECT dhash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         |FROM h GROUP BY dhash""".stripMargin,
    "qa1_audio_fp" ->
      s"""$audioCtes
         |SELECT doc_id, afp FROM ah""".stripMargin,
    "qa2_audio_dup_pairs" ->
      s"""$audioCtes
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.afp, b.afp))::INT AS hamming
         |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.afp, b.afp)) <= 3""".stripMargin)
}

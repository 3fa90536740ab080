package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque binary payload + typed metadata. */
final case class MediaAsset(
    asset_id: Long,
    media_type: String,
    payload: Array[Byte])

/** Extracted features for one asset. */
final case class MediaFeatures(
    asset_id: Long,
    media_type: String,
    n_bytes: Long,
    content_hash: String,
    width: Int,
    height: Int,
    n_frames: Int,
    feature_vec: Array[Float])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch form per partition.
  *
  * The IMAGE leg decodes for real via JDK ImageIO (`decodeReal`: true
  * width/height from PNG/JPEG bytes plus a luminance-histogram feature
  * vector — zero extra dependencies). Audio/video decoding is STUBBED
  * (no such codecs in the JDK — see `decodeStub`): it derives
  * deterministic fake dimensions/frames/features from the bytes.
  * Everything around both — the binary-column schema, per-partition
  * batch shape, partition sizing, and the decode → feature-extract →
  * (optional) dedup pipeline — is the real Spark plumbing any further
  * codec binding would drop into.
  *
  * Scale notes: payloads stay in one column so Parquet keeps them out of
  * predicate scans (column pruning means metadata-only queries never read
  * bytes); `repartition` before the decode controls batch memory; the
  * decode itself is `mapPartitions`, the JVM analogue of `mapInPandas`
  * batching.
  */
object Multimodal {

  /** STUB decoder — replace with a real codec binding in production.
    * Deterministic in the payload bytes so tests are stable. */
  def decodeStub(a: MediaAsset): MediaFeatures =
    decodeWithHash(a, graft.core.Blake2b.hexDigest(a.payload))

  /** Real decoder, zero new dependencies. IMAGE leg: JDK
    * `javax.imageio.ImageIO` parses PNG/JPEG/GIF/BMP bytes to true
    * dimensions, feature vector = 8-bin luminance histogram (normalized
    * to [0,1], deterministic in the pixels). AUDIO leg: JDK
    * `javax.sound.sampled.AudioSystem` parses WAV/AIFF/AU PCM to true
    * sample rate / channels / frame count, feature vector = 8-segment
    * RMS energy envelope (see [[decodeAudio]]). VIDEO stays on the stub —
    * no video codec exists in the JDK; a production binding would drop
    * into the same `mapPartitions` slot. Bytes neither codec can parse
    * (wrong type tag, truncated file, compressed audio) fall back to the
    * stub rather than failing the batch, mirroring how a production
    * decode pipeline quarantines undecodable assets. */
  def decodeReal(a: MediaAsset): MediaFeatures =
    if (a.media_type == "audio") decodeAudio(a).getOrElse(decodeStub(a))
    else if (a.media_type != "image") decodeStub(a)
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) decodeStub(a)
      else {
        val hist = new Array[Long](8)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            // integer ITU-R 601 luma: deterministic, no float rounding
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
          graft.core.Blake2b.hexDigest(a.payload),
          img.getWidth, img.getHeight, 1,
          hist.map(h => h.toFloat / n))
      }
    }

  /** Real AUDIO decode via the JDK's `javax.sound.sampled`: parses the
    * container (WAV/AIFF/AU), converts to 16-bit signed PCM if the
    * stored encoding differs (8-bit, unsigned, big-endian), and returns
    *   width    = sample rate in Hz,
    *   height   = channel count,
    *   n_frames = PCM frame count,
    *   feature_vec = 8-segment RMS energy envelope in [0,1]
    *     (channel-interleaved samples pooled; amplitude / 32768).
    * The width/height slots reuse the fixed [[MediaFeatures]] schema the
    * way a media pipeline reuses generic "dim0/dim1" metadata columns.
    * None for anything the JDK cannot decode (MP3/OGG/video/garbage) —
    * the caller quarantines to the stub. */
  def decodeAudio(a: MediaAsset): Option[MediaFeatures] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        val src = raw.getFormat
        val want = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val pcm =
          if (src.matches(want)) raw
          else AudioSystem.getAudioInputStream(want, raw)
        // closing the converting stream also closes the wrapped raw one;
        // without this the converter leaks when assets are ever
        // stream-backed (harmless today on ByteArrayInputStream)
        val bytes = try pcm.readAllBytes() finally pcm.close()
        val channels = want.getChannels
        val nSamples = bytes.length / 2 // interleaved 16-bit samples
        val frames = nSamples / channels
        if (frames == 0) None
        else {
          // 8-segment RMS envelope over interleaved samples: segment s
          // covers samples [s*n/8, (s+1)*n/8) — deterministic integer
          // boundaries, channels pooled
          val sumSq = new Array[Double](8)
          val cnt = new Array[Long](8)
          var i = 0
          while (i < nSamples) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt // sign-extends
            val s = (hi << 8) | lo
            val seg = ((i.toLong * 8) / nSamples).toInt
            sumSq(seg) += s.toDouble * s
            cnt(seg) += 1
            i += 1
          }
          val vec = Array.tabulate(8)(s =>
            if (cnt(s) == 0) 0f
            else (math.sqrt(sumSq(s) / cnt(s)) / 32768.0).toFloat)
          Some(MediaFeatures(a.asset_id, a.media_type,
            a.payload.length.toLong,
            graft.core.Blake2b.hexDigest(a.payload),
            want.getSampleRate.toInt, channels, frames, vec))
        }
      } finally raw.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder keyed on md5 instead of blake2b: identical feature
    * derivation, but oracle-checkable because DuckDB shares md5 (and can
    * parse the same hex prefixes with `('0x' || …)::BIGINT`). */
  def decodeStubMd5(a: MediaAsset): MediaFeatures = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    decodeWithHash(a, digest.digest(a.payload).map("%02x".format(_)).mkString)
  }

  private def decodeWithHash(a: MediaAsset, hash: String): MediaFeatures = {
    // fake dimensions derived from content; a real impl would parse the
    // container header instead
    val h = java.lang.Long.parseLong(hash.take(8), 16)
    val width = (h % 1920 + 1).toInt
    val height = ((h >> 16) % 1080 + 1).toInt
    val frames = a.media_type match {
      case "video" => (a.payload.length % 240) + 1
      case "audio" => (a.payload.length % 48000) + 1
      case _ => 1
    }
    val vec = Array.tabulate(8) { i =>
      ((java.lang.Long.parseLong(hash.substring(i * 2, i * 2 + 2), 16)
        / 255.0f) * 2 - 1)
    }
    MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
      hash, width, height, frames, vec)
  }

  /** Decode + feature-extract over binary columns, batched per partition.
    * `batchPartitions` bounds per-task memory for large payloads. */
  def extractFeatures(
      assets: Dataset[MediaAsset],
      batchPartitions: Int = 0,
      decoder: MediaAsset => MediaFeatures = decodeStub): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    val repartitioned =
      if (batchPartitions > 0) assets.repartition(batchPartitions)
      else assets
    repartitioned.mapPartitions(_.map(decoder))
  }

  /** Synthesize a MediaAsset table from the documents table (the test
    * environment has no real media): text bytes become the payload, the
    * media type cycles deterministically. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** Frame sampling for video/audio assets: up to `k` evenly-spaced
    * frame indices per asset (deterministic — index i of k spans
    * [0, n_frames)), exploded to one row per sampled frame. The stub
    * "frame" is a hash of (content, index); a real decoder would seek and
    * decode at the index. */
  def sampleFrames(features: Dataset[MediaFeatures], k: Int = 4): DataFrame = {
    import features.sparkSession.implicits._
    // floor() is explicit so the truncation direction is engine-agnostic
    // (a bare CAST(double AS INT) truncates in Spark but rounds in DuckDB)
    features.toDF()
      .filter(col("media_type").isin("video", "audio"))
      .withColumn("frame_idx", explode(expr(
        s"array_distinct(transform(sequence(0, $k - 1), " +
          "i -> CAST(floor(i * n_frames / $k) AS INT)))".replace("$k", k.toString))))
      .select(col("asset_id"), col("media_type"), col("n_frames"),
        col("frame_idx"),
        md5(concat(col("content_hash"), lit(":"), col("frame_idx")))
          .as("frame_stub"))
  }

  /** 64-bit average-hash (aHash) of a decodable image: box-average the
    * ITU-R 601 integer luma onto an 8×8 grid (cells get ≥1 source
    * column/row even for tiny images), bit (cy·8+cx) set iff the cell
    * is STRICTLY brighter than the integer mean of all 64 cells —
    * everything integer, so the hash is a pure function of the pixels.
    * Box averaging makes the hash invariant to integer-multiple
    * rescales of the same pattern (spec-asserted), which is exactly
    * what makes it a near-dup signature rather than a byte hash:
    * re-encoded, resized, or lightly-noised copies of one image land
    * within a few bits. None for anything ImageIO cannot decode (the
    * quarantine path, like [[decodeReal]]). */
  def perceptualHash(a: MediaAsset): Option[Long] = {
    if (a.media_type != "image") return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return None
    val w = img.getWidth
    val h = img.getHeight
    val cells = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8
        val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        cells(cy * 8 + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= (1L << i)
      i += 1
    }
    Some(bits)
  }

  /** (asset_id, phash) for every DECODABLE image asset — per-partition
    * batch decode like [[extractFeatures]]; undecodable or non-image
    * assets are quarantined out (they have no pixel identity). */
  def imageHashes(assets: Dataset[MediaAsset],
      batchPartitions: Int = 0): DataFrame = {
    import assets.sparkSession.implicits._
    val repartitioned =
      if (batchPartitions > 0) assets.repartition(batchPartitions)
      else assets
    repartitioned
      .mapPartitions(_.flatMap(a => perceptualHash(a).map(h => (a.asset_id, h))))
      .toDF("asset_id", "phash")
  }

  /** Near-duplicate IMAGE pairs: perceptual hashes joined through the
    * same banded-Hamming candidate generator as text SimHash
    * ([[Dedup.simhashPairsFromHashes]]), then exact Hamming confirm.
    * The band count is derived as maxHamming + 1, so the pigeonhole
    * recall guarantee holds at WHATEVER distance the caller asks for —
    * the old fixed 4×16 banding silently lost pairs at Hamming 4..8
    * that differed by one bit per band. The image leg of the dedup
    * family: re-encoded/resized/lightly-edited copies of one image
    * pair up here where the byte-level content hash sees nothing. At
    * scale this is band equi-joins over 8-byte hashes — the corpus's
    * pixel data is read once by the hashing pass and never joined. */
  def imageNearDups(assets: Dataset[MediaAsset],
      maxHamming: Int = 3, batchPartitions: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming out of range for 64-bit banding")
    // min 2 bands: a 1-band split would be the whole hash (restBits=64
    // overflows the mask); 2 bands still guarantee recall at Hamming ≤1
    val bands = math.max(2, maxHamming + 1)
    Dedup.simhashPairsFromHashes(
      imageHashes(assets, batchPartitions)
        .select(col("asset_id").as("doc_id"), col("phash").as("simhash")),
      maxHamming, bandBits = 64 / bands, bands = bands)
      .select(col("doc_a").as("asset_a"), col("doc_b").as("asset_b"),
        col("hamming"))
  }

  /** Render one REAL 64×64 grayscale PNG per row from an
    * (asset_id, blocks: array<int> of 64 values) frame: block i fills
    * the 8×8-pixel cell (row i/8, col i%8) with gray value
    * `blocks[i] & 0xff`. This is the battery's bridge from relational,
    * oracle-computable block values to the genuine ImageIO
    * encode→decode pixel path: PNG is lossless and the luminance of
    * gray v is exactly v, so [[perceptualHash]]'s 8×8 box means
    * reproduce the block values bit-for-bit and the aHash is a pure
    * integer function of `blocks` that a SQL oracle can replay without
    * any image codec. Executor-side mapPartitions — pixel bytes never
    * visit the driver. */
  def renderBlockAssets(blocks: DataFrame): Dataset[MediaAsset] = {
    import blocks.sparkSession.implicits._
    blocks
      .select(col("asset_id").cast("long"), col("blocks"))
      .as[(Long, Seq[Int])]
      .mapPartitions(_.map { case (id, vs) =>
        require(vs.length == 64, s"need 64 block values, got ${vs.length}")
        val img = new java.awt.image.BufferedImage(
          64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 64) {
          var x = 0
          while (x < 64) {
            val v = vs((y / 8) * 8 + (x / 8)) & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaAsset(id, "image", bos.toByteArray)
      })
  }

  /** Full pipeline as a DataFrame (for the query battery): synthesize →
    * decode(stub) → features + per-type stats-friendly projection. */
  def pipeline(
      docs: DataFrame,
      decoder: MediaAsset => MediaFeatures = decodeStub): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(assetsFromDocuments(docs),
      batchPartitions = docs.sparkSession.sparkContext.defaultParallelism,
      decoder = decoder)
      .toDF()
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("content_hash"), col("width"), col("height"), col("n_frames"))
      .orderBy(col("asset_id"))
  }
}

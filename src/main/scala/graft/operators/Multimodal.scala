package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs executor-side over partitions of raw bytes.
  *
  * The image decode is REAL: `javax.imageio.ImageIO` (JDK-bundled — zero
  * added dependencies) decodes PNG payloads executor-side and the emitted
  * features are actual width/height/pixel statistics. The gate closes the
  * loop without the oracle ever decoding a byte: fixture payloads are
  * deterministic functions of `doc_id` ([[withImagePayloads]]), so DuckDB
  * recomputes the expected stats analytically and a hash match proves the
  * whole encode → PNG bytes → decode → stats path byte-exact.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class ImageFeatures(doc_id: Long, img_w: Long, img_h: Long,
      px_sum: Long, px_min: Long, px_max: Long)

  /** Attach an opaque binary payload + metadata struct. Here the payload is
    * the UTF-8 text bytes; in production it is the image/audio blob column
    * of the source table. */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("format"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("media_meta"))

  /** Attach a REAL PNG payload per document, synthesized executor-side as a
    * pure function of `doc_id`: a w×h grayscale gradient with
    * w = 4 + doc_id mod 5, h = 3 + doc_id mod 4, and
    * pixel(x,y) = (doc_id·31 + 7x + 13y) mod 256, encoded through
    * `ImageIO.write(_, "png", _)`. In production this column is the blob
    * column of the source table; the synthetic path exists so the decode
    * gate has payloads whose expected statistics an oracle can derive
    * WITHOUT a codec. PNG is lossless, so decode must return these exact
    * pixels — any drift in the codec round-trip breaks the hash gate. */
  def withImagePayloads(docs: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    docs.select(col("doc_id")).as[Long](Encoders.scalaLong)
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory encode, no temp files
        ids.map { id =>
          val w = 4 + java.lang.Math.floorMod(id, 5L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 4L).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y, 256L).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, bos.toByteArray)
        }
      }
      .toDF()
  }

  /** Executor-side REAL image decode over the binary column, one partition
    * at a time (the `mapPartitions` shape amortizes codec initialization —
    * here `ImageIO.setUseCache(false)` so decode never touches disk; a
    * model-based extractor would load its weights in the same spot).
    * Decodes each payload with `javax.imageio.ImageIO` and emits the
    * dimensions plus exact integer pixel statistics over the gray channel
    * (the fixtures write r=g=b; a natural-image corpus would luma-weight).
    * Integer stats, not float means, so the output is engine-exact and
    * combinable downstream. */
  def extractFeatures(media: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ImageFeatures]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          require(img != null, s"undecodable image payload for doc ${r.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L; var mn = 255L; var mx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (img.getRGB(x, y) & 0xff).toLong
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          ImageFeatures(r.doc_id, w.toLong, h.toLong, sum, mn, mx)
        }
      }
      .toDF()
  }

  case class ImageAHash(doc_id: Long, ahash: Long)
  case class PooledImage(doc_id: Long, out_w: Long, out_h: Long,
      pool_sum: Long, pool_min: Long, pool_max: Long)

  /** Average-hash over REAL decoded pixels (the decode-path counterpart of
    * the byte-level [[phashGroups]]): decode the PNG with ImageIO, then
    * bit i (row-major pixel order) = 1 iff pixel_i · (w·h) > Σ pixels —
    * the aHash mean comparison as an exact integer cross-multiply, no
    * division. The fixtures are ≤ 8×6 so the hash is ≤ 48 bits in a long;
    * a natural-image variant pools to a fixed 8×8 first ([[poolImages]]
    * is that operator) — same contract, more bits.
    *
    * The gate is the decode-proof shape of mm_features: the oracle derives
    * the expected hash from the fixture formula, Spark derives it from
    * actually-decoded pixels, and equal-hash dup GROUPS (the pixel pattern
    * repeats every lcm(5,4,256) = 1280 doc_ids) must agree exactly. */
  def imageAHash(media: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ImageAHash]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          require(img != null, s"undecodable image payload for doc ${r.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          val px = new Array[Long](w * h)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(i) = (img.getRGB(x, y) & 0xff).toLong; i += 1; x += 1
            }
            y += 1
          }
          val total = px.sum
          val n = (w * h).toLong
          var hash = 0L
          i = 0
          while (i < px.length) {
            if (px(i) * n > total) hash |= 1L << i
            i += 1
          }
          ImageAHash(r.doc_id, hash)
        }
      }
      .toDF()
  }

  case class AudioFeatures(doc_id: Long, n_samples: Long, duration_ms: Long,
      energy: Long, zero_cross: Long, peak: Long)
  case class AudioFrame(doc_id: Long, frame: Long, frame_energy: Long)

  /** Attach a REAL WAV payload per document, synthesized executor-side as
    * a pure function of `doc_id`: PCM16 mono at 8 kHz,
    * n = 800 + (doc_id mod 5)·80 samples,
    * s_k = ((doc_id·31 + 17k) mod 2003) − 1001 — an integer pseudo-noise
    * waveform, chosen over a sinusoid so the oracle's closed form needs no
    * transcendentals. Encoded through `javax.sound.sampled.AudioSystem`
    * (JDK-bundled, headless-safe file IO — the audio analog of the
    * ImageIO decision above, still zero added dependencies). PCM is
    * lossless, so decode must return these exact samples; in production
    * this column is the source table's audio blob. */
  def withAudioPayloads(docs: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    docs.select(col("doc_id")).as[Long](Encoders.scalaLong)
      .mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        ids.map { id =>
          val n = 800 + java.lang.Math.floorMod(id, 5L).toInt * 80
          val pcm = new Array[Byte](n * 2)
          var k = 0
          while (k < n) {
            val s = (java.lang.Math.floorMod(id * 31 + 17L * k, 2003L) - 1001L).toInt
            pcm(2 * k) = (s & 0xff).toByte
            pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
            k += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRow(id, bos.toByteArray)
        }
      }
      .toDF()
  }

  /** Decode a WAV payload to PCM16 samples; the container/format checks
    * fail loudly on anything but signed little-endian 16-bit mono (the
    * fixture contract — a production corpus would resample here). */
  private def decodePcm16(media: Array[Byte], docId: Long): (Array[Int], Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(media))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unsupported audio format for doc $docId: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      out(k) = ((bytes(2 * k + 1) << 8) | (bytes(2 * k) & 0xff)).toShort.toInt
      k += 1
    }
    (out, fmt.getSampleRate.toLong)
  }

  /** REAL audio decode + clip-level features over the binary column:
    * `AudioSystem.getAudioInputStream` parses the WAV container and the
    * PCM frames are re-assembled into samples executor-side; the emitted
    * stats are pure integers over the decoded samples (energy = Σs²,
    * strict-sign zero crossings, peak |s|) — engine-exact and combinable.
    * The gate is the decode-proof shape of mm_features: the oracle derives
    * the same stats analytically from the fixture formula without decoding
    * a byte, so a hash match proves the encode → WAV bytes → decode →
    * stats path sample-exact. Per-partition `mapPartitions`, bounded
    * memory per clip; at 100 TB this is the canonical scan-speed decode
    * pass (no shuffle until the gate's output sort). */
  def audioFeatures(media: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[AudioFeatures]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (s, sr) = decodePcm16(r.media, r.doc_id)
          var energy = 0L; var zc = 0L; var peak = 0L
          var k = 0
          while (k < s.length) {
            val v = s(k).toLong
            energy += v * v
            val a = if (v < 0) -v else v
            if (a > peak) peak = a
            if (k >= 1 && v * s(k - 1) < 0L) zc += 1
            k += 1
          }
          AudioFeatures(r.doc_id, s.length.toLong,
            s.length.toLong * 1000L / sr, energy, zc, peak)
        }
      }
      .toDF()
  }

  /** Frame-level energies over decoded samples (frame = hop = `frameLen`
    * samples, 20 ms at 8 kHz) with the top `k` loudest frames per clip —
    * the audio analog of video frame-sampling: a curation pipeline keeps
    * the informative frames, not the whole clip. The per-clip fan-out is
    * ≤ ceil(n/frameLen) rows (bounded per row), the top-k is a per-doc
    * rank window keyed on doc_id, and ties break deterministically by
    * frame index. Edge frames pool what they cover. */
  def audioTopFrames(media: DataFrame, frameLen: Int = 160, k: Int = 3): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[AudioFrame]
    val frames = media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (s, _) = decodePcm16(r.media, r.doc_id)
          (0 until (s.length + frameLen - 1) / frameLen).map { f =>
            var e = 0L
            var i = f * frameLen
            val end = math.min(i + frameLen, s.length)
            while (i < end) { e += s(i).toLong * s(i); i += 1 }
            AudioFrame(r.doc_id, f.toLong, e)
          }
        }
      }
      .toDF()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("frame_energy").desc, col("frame"))
    frames.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("frame"), col("frame_energy"),
        col("rk").cast("long").as("loudness_rank"))
      .orderBy("doc_id", "loudness_rank")
  }

  /** Equal-ahash near-dup groups over [[imageAHash]] — the removed-rows
    * convention of the other dedup gates (only group members emit). */
  def imageAHashGroups(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = imageAHash(media)
    val wnd = Window.partitionBy("ahash")
    h.withColumn("canonical_doc_id", min(col("doc_id")).over(wnd))
      .withColumn("group_size", count(lit(1)).over(wnd))
      .filter(col("group_size") > 1)
      .select("doc_id", "ahash", "canonical_doc_id", "group_size")
      .orderBy("doc_id")
  }

  /** REAL 2×2 average-pool downsample over decoded pixels — the actual
    * image-resize semantics behind the byte-level [[resize]] stub: decode,
    * pool each 2×2 block (edge blocks pool what they cover) with
    * floor_div(block sum, block count), and emit the pooled grid's exact
    * integer statistics. The oracle replays the same pooling arithmetic on
    * the fixture formula — decode + pooling both certified by hash. */
  def poolImages(media: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[PooledImage]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          require(img != null, s"undecodable image payload for doc ${r.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          val ow = (w + 1) / 2
          val oh = (h + 1) / 2
          var sum = 0L; var mn = 255L; var mx = 0L
          var oy = 0
          while (oy < oh) {
            var ox = 0
            while (ox < ow) {
              var bs = 0L; var bn = 0L
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val x = ox * 2 + dx; val y = oy * 2 + dy
                  if (x < w && y < h) {
                    bs += (img.getRGB(x, y) & 0xff).toLong; bn += 1
                  }
                  dx += 1
                }
                dy += 1
              }
              val v = bs / bn // non-negative: trunc = floor
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              ox += 1
            }
            oy += 1
          }
          PooledImage(r.doc_id, ow.toLong, oh.toLong, sum, mn, mx)
        }
      }
      .toDF()
  }

  case class ResizedMedia(doc_id: Long, media: Array[Byte], orig_bytes: Long)

  /** "Resize" over opaque bytes: deterministic stride-downsample to at most
    * `targetBytes`. STUB for a real image resize — the partition-wise typed
    * traversal, binary-in/binary-out schema, and size contract are the
    * production shape; only the byte math is fake. */
  def resize(media: DataFrame, targetBytes: Int = 64): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ResizedMedia]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.media.length
          val out =
            if (n <= targetBytes) r.media
            else {
              val stride = n.toDouble / targetBytes
              Array.tabulate(targetBytes)(i => r.media((i * stride).toInt))
            }
          ResizedMedia(r.doc_id, out, n.toLong)
        }
      }
      .toDF()
  }

  case class MediaHash(doc_id: Long, phash32: Long)

  /** Perceptual-hash near-dup grouping over the binary payload — the
    * multimodal counterpart of exact text dedup: a 32-bit block-mean hash
    * (bit k = 1 iff block k's byte mean exceeds the payload's global byte
    * mean — the aHash construction; a real pHash swaps in a DCT over
    * decoded pixels, same 32-bit contract), then equal-hash grouping with
    * the exact-dedup removed-rows convention. GROUPS, not pairs: a
    * popular payload (or the all-empty hash 0) would explode a pair join
    * quadratically; the group form stays linear in members.
    *
    * The mean comparison is pure integer cross-multiplication
    * (block_sum·n > total·block_len — no division for engines to
    * disagree on), blocks are integer-division index ranges, so the
    * DuckDB oracle reproduces every bit over the ASCII corpus (byte i ==
    * ascii(char i), the resize-oracle precondition).
    *
    * Shape: hashing is partition-wise over raw bytes (the codec-amortizing
    * mapPartitions shape); grouping is ONE phash-keyed exchange shared by
    * the size and canonical windows; a partition's size is one hash's
    * collision count — bounded by content duplication, not corpus size.
    *
    * Output: docs in multi-member groups only — (doc_id, phash32,
    * canonical_doc_id = min member, group_size), ordered by doc_id. */
  def phashGroups(media: DataFrame, bits: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = phash(media, bits)
    val w = Window.partitionBy("phash32")
    hashed
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_doc_id", min(col("doc_id")).over(w))
      .filter(col("group_size") > 1)
      .select("doc_id", "phash32", "canonical_doc_id", "group_size")
      .orderBy("doc_id")
  }

  /** (doc_id, phash32): the block-mean perceptual hash alone — the shared
    * kernel of [[phashGroups]] (exact-collision dedup) and
    * [[hardNegativePairs]] (near-collision mining). */
  def phash(media: DataFrame, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must fit a positive long, got $bits")
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[MediaHash]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.media
          val n = bytes.length
          var total = 0L
          var i = 0
          while (i < n) { total += bytes(i) & 0xff; i += 1 }
          var h = 0L
          var k = 0
          while (k < bits) {
            val start = (k.toLong * n / bits).toInt
            val end = ((k + 1).toLong * n / bits).toInt
            var bs = 0L
            var j = start
            while (j < end) { bs += bytes(j) & 0xff; j += 1 }
            if (bs * n > total * (end - start)) h |= 1L << k
            k += 1
          }
          MediaHash(r.doc_id, h)
        }
      }
      .toDF()
  }

  /** Hard-negative mining for contrastive (CLIP-style) pair training: for
    * each media item, the k most perceptually-similar-but-not-identical
    * items by phash Hamming distance — the negatives that actually teach a
    * contrastive objective something (random negatives are trivially far).
    *
    * Candidates come from `bandBits`-bit Hamming-LSH bands over the
    * `bits`-bit hash (bits/bandBits bands; by pigeonhole, two hashes
    * within Hamming < bits/bandBits of each other ALWAYS share an intact
    * band — so the closest negatives are found exactly, not
    * probabilistically; distances up to `maxHamming` are kept best-effort
    * via shared bands). Identical hashes (Hamming 0) are the
    * DUPLICATE set — [[phashGroups]]' business, excluded here so a dup
    * never becomes a training negative (the classic false-negative
    * poisoning bug in contrastive pipelines).
    *
    * Shape: band-keyed self-join (never all-pairs), distinct pair set,
    * integer xor+bit_count scoring, per-anchor top-k through the rank
    * window (WindowGroupLimit keeps it bounded per group).
    *
    * Band geometry is the scale lever: candidates per band grow as
    * n²/2^bandBits, so the band space must outgrow the corpus. The
    * CURRENT geometry is 48-bit/12-bit — 4096 values per band, 4-band
    * pigeonhole (any pair within Hamming 3 shares an intact band). The
    * retired 32-bit/8-bit first cut is kept here only as the measurement
    * that set the default: its 256-value band space saturated and every
    * bucket went quadratic (674 s at 500k docs); 48/12 cuts candidate
    * volume 16×. At larger corpora, widen again (62/15 fits the long) —
    * geometry, not algorithm, is the knob. */
  def hardNegativePairs(media: DataFrame, bits: Int = 48, bandBits: Int = 12,
      maxHamming: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = graft.RunHygiene.stage(phash(media, bits))
    hashed.count() // both self-join sides read one hash pass
    val nBands = bits / bandBits
    val mask = (1 << bandBits) - 1
    val bands = hashed.select(col("doc_id"), col("phash32"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band_idx"),
            expr(s"(phash32 >> ${b * bandBits}) & $mask").as("band_val"))): _*)).as("bv"))
      .select(col("doc_id"), col("phash32"), col("bv.band_idx"), col("bv.band_val"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash32").as("ha"), col("b.phash32").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
    val bidir = cand.select(col("doc_a").as("anchor_doc"), col("doc_b").as("neg_doc"), col("hamming"))
      .unionAll(cand.select(col("doc_b").as("anchor_doc"), col("doc_a").as("neg_doc"), col("hamming")))
    val w = Window.partitionBy("anchor_doc").orderBy(col("hamming"), col("neg_doc"))
    bidir.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("anchor_doc", "rank")
  }

  case class Frame(doc_id: Long, frame_index: Int, offset: Long, n_bytes: Long,
      frame_md5: String)

  /** Frame sampling: split the payload into fixed-size chunks and keep every
    * `everyNth` — the explode shape of video processing (one output row per
    * sampled frame, metadata travels with each). STUB for a real demuxer;
    * the flatMap plumbing and per-frame metadata schema are real. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, everyNth: Int = 2): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[Frame]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          r.media.grouped(frameBytes).zipWithIndex
            .filter { case (_, i) => i % everyNth == 0 }
            .map { case (chunk, i) =>
              Frame(r.doc_id, i, i.toLong * frameBytes, chunk.length.toLong,
                digest.digest(chunk).map("%02x".format(_)).mkString)
            }
        }
      }
      .toDF()
  }
}

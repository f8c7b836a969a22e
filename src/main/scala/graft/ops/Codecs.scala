package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real media codecs over in-memory byte payloads — the decode layer under
  * [[Multimodal]].
  *
  * Everything here is pure JVM, no native libraries:
  *   - images: `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the JDK);
  *   - audio: `javax.sound.sampled.AudioSystem` (RIFF/WAVE PCM);
  *   - video: a minimal length-prefixed PNG-frame container (`GVC1`) defined
  *     below — the JDK has no video codec, so the container format is ours
  *     but every frame inside it is a real PNG decoded by ImageIO.
  *
  * Decoders return `None` on undecodable payloads instead of throwing:
  * at 100 TB corrupt media is routine, and the caller routes failures to a
  * quarantine/audit path rather than killing the task (same philosophy as
  * the bronze-layer `try_to_timestamp` routing).
  *
  * Thread-safety: `ImageIO.read`/`write` create a fresh reader/writer per
  * call, safe under local[32]; the disk-backed ImageIO cache is disabled
  * once at class-init so decode stays in-memory on executors.
  */
object Codecs {

  ImageIO.setUseCache(false)

  final case class ImageMeta(width: Int, height: Int, channels: Int)
  /** `nSamples` is frames per channel (RIFF frame = one sample across all
    * channels). */
  final case class AudioMeta(channels: Int, sampleRateHz: Int, nSamples: Int)
  final case class VideoMeta(width: Int, height: Int, nFrames: Int, channels: Int)

  // ---------------------------------------------------------------- images

  /** Deterministic PNG: a `width`×`height` 3-band (BGR) image whose pixels
    * are an xorshift64 stream seeded by `seed`, compressed by the JDK PNG
    * writer. Used to synthesize test corpora; the bytes are a real PNG that
    * any external tool decodes. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
    var s = seed | 1L // xorshift must not start at 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        img.setRGB(x, y, (s & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode (any ImageIO-supported format: PNG/JPEG/BMP/GIF).
    * Width/height/band-count come from the decoded raster, not from any
    * header shortcut — the pixels are actually decompressed. */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        .map(img => ImageMeta(img.getWidth, img.getHeight, img.getRaster.getNumBands))
    } catch { case _: Exception => None }

  /** Real resize: decode → bilinear `Graphics2D` scale into a fresh 3-band
    * image → re-encode PNG. `None` if the payload isn't a decodable image. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"bad target dims ${w}x$h")
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { src =>
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }
  }

  /** Perceptual difference-hash (dHash) over the REAL decoded pixels:
    * decode → bilinear-scale to a 9×8 grayscale thumbnail → one bit per
    * adjacent-pixel horizontal gradient (left < right), 64 bits total.
    * Near-identical images (re-encodes, mild resizes, small edits) land
    * within a few bits of Hamming distance; unrelated images sit near
    * 32. That contract presumes natural-image structure — gradients
    * that survive resampling; pure noise re-rolls its thumbnail under
    * rescale (measured Hamming ~17 for a resized noise image) and is
    * outside perceptual hashing's domain. This is the
    * candidate-then-verify contract
    * [[graft.ops.Dedup.hammingPairs64]] consumes. Deterministic for a
    * given JVM's Java2D raster pipeline (this container's), which is
    * what golden-pinning requires; cross-platform runs should re-pin.
    * `None` if the payload isn't a decodable image. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { src =>
        val dst = new BufferedImage(9, 8, BufferedImage.TYPE_BYTE_GRAY)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, 9, 8, null)
        } finally g.dispose()
        val r = dst.getRaster
        var h = 0L
        var bit = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (r.getSample(x, y, 0) < r.getSample(x + 1, y, 0)) h |= (1L << bit)
            bit += 1; x += 1
          }
          y += 1
        }
        h
      }
    } catch { case _: Exception => None }

  // ----------------------------------------------------------------- audio

  /** Deterministic RIFF/WAVE, PCM signed 16-bit little-endian: `nSamples`
    * frames of `channels` samples from an xorshift64 stream. A real WAV —
    * `AudioSystem` (or any player) reads it. */
  def encodeWav(channels: Int, sampleRateHz: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(channels > 0 && sampleRateHz > 0 && nSamples >= 0, "bad wav params")
    val dataLen   = nSamples * channels * 2
    val byteRate  = sampleRateHz * channels * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRateHz)
      .putInt(byteRate)
      .putShort((channels * 2).toShort)          // block align
      .putShort(16.toShort)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = seed | 1L
    var i = 0
    while (i < nSamples * channels) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      buf.putShort((s & 0xffffL).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real WAV decode via `AudioSystem`: channel count and sample rate from
    * the parsed format, frame count from the stream length. */
  def decodeWav(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        if (frames < 0 || frames > Int.MaxValue) None
        else Some(AudioMeta(f.getChannels, f.getSampleRate.toInt, frames.toInt))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Acoustic fingerprint over REAL decoded PCM (a chromaprint-shaped
    * reduction): `AudioSystem` decode → mono mix → 33 equal frames →
    * per-frame spectral energy in 2 fixed bands (Goertzel at 0.02 and
    * 0.10 cycles/sample) → one bit per (frame transition, band):
    * energy rose vs the previous frame. 32 transitions × 2 bands =
    * 64 bits for [[graft.ops.Dedup.hammingPairs64]].
    *
    * Uniform gain scales every energy by c², so the rose/fell
    * comparisons — and the fingerprint — are volume-invariant up to
    * quantization (spec-asserted within a few bits). `None` if the
    * payload isn't decodable 16-bit PCM or is too short to frame. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian) return None
        val raw = ais.readAllBytes()
        val ch = f.getChannels
        val nFrames = raw.length / (2 * ch)
        val frames = 33
        val perFrame = nFrames / frames
        if (perFrame < 2) return None
        // mono mix into doubles, one pass
        val mono = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          var s = 0.0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            s += ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort.toDouble
            c += 1
          }
          mono(i) = s / ch
          i += 1
        }
        val bands = Array(0.02, 0.10) // cycles per sample
        val e = Array.ofDim[Double](frames, bands.length)
        var fi = 0
        while (fi < frames) {
          var b = 0
          while (b < bands.length) {
            // Goertzel power at the band frequency over this frame
            val w = 2.0 * math.Pi * bands(b)
            val coeff = 2.0 * math.cos(w)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var n = fi * perFrame
            val end = n + perFrame
            while (n < end) {
              s0 = mono(n) + coeff * s1 - s2
              s2 = s1; s1 = s0
              n += 1
            }
            e(fi)(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
            b += 1
          }
          fi += 1
        }
        var h = 0L
        var bit = 0
        fi = 1
        while (fi < frames) {
          var b = 0
          while (b < bands.length) {
            if (e(fi)(b) > e(fi - 1)(b)) h |= (1L << bit)
            bit += 1; b += 1
          }
          fi += 1
        }
        Some(h)
      } finally ais.close()
    } catch { case _: Exception => None }

  // ----------------------------------------------------------------- video

  private val VideoMagic = "GVC1".getBytes("US-ASCII")

  /** Minimal video container (the JDK ships no video codec): the `GVC1`
    * magic, a big-endian int32 frame count, then per frame a big-endian
    * int32 length + a real PNG payload. Deliberately trivial — the point is
    * that frame *grab* is a bounded slice and frame *decode* is a real PNG
    * decode, which is the shape an ffmpeg-backed decoder has too. */
  def encodeVideo(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be > 0 (got $nFrames)")
    val frames = (0 until nFrames).map(i => encodePng(width, height, seed * 1000003L + i))
    val buf = ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    buf.put(VideoMagic).putInt(nFrames)
    frames.foreach(f => buf.putInt(f.length).put(f))
    buf.array()
  }

  /** Container-level metadata + a real decode of frame 0 for dimensions.
    * `nFrames` is the count of frames actually present and extractable
    * (min of the header claim and a bounds-checked offset walk), so a
    * truncated container's metadata agrees with what [[videoFrames]] /
    * frame sampling will actually emit rather than overstating it. */
  def decodeVideoMeta(bytes: Array[Byte]): Option[VideoMeta] =
    videoFrames(bytes) match {
      case Some(it) if it.hasNext =>
        val (_, first) = it.next()
        decodeImage(first).map(m => VideoMeta(m.width, m.height, actualFrameCount(bytes), m.channels))
      case _ => None
    }

  private def frameCount(bytes: Array[Byte]): Int =
    ByteBuffer.wrap(bytes, 4, 4).getInt

  /** Frames physically present: walks the length-prefix chain without
    * copying any frame payloads, stopping at the header count or the first
    * out-of-bounds slice, whichever comes first. */
  private def actualFrameCount(bytes: Array[Byte]): Int = {
    val claimed = frameCount(bytes)
    var n = 0
    var off = 8
    while (n < claimed && off + 4 <= bytes.length) {
      val len = ByteBuffer.wrap(bytes, off, 4).getInt
      // bound check in LONG: a corrupt length near Int.MaxValue would
      // wrap `off + 4 + len` negative, pass an Int comparison, and the
      // next wrap() would throw instead of quarantining the payload
      if (len < 0 || off.toLong + 4 + len > bytes.length) return n
      off += 4 + len
      n += 1
    }
    n
  }

  /** Lazily slice out `(frameIdx, pngBytes)` pairs; `None` when the payload
    * is not a well-formed `GVC1` container. Bounds-checked so a truncated
    * payload yields a short iterator rather than an exception mid-stream. */
  def videoFrames(bytes: Array[Byte]): Option[Iterator[(Int, Array[Byte])]] = {
    if (bytes.length < 8 || !bytes.startsWith(VideoMagic)) return None
    val n = frameCount(bytes)
    if (n <= 0) return None
    val it = new Iterator[(Int, Array[Byte])] {
      private var idx = 0
      private var off = 8
      def hasNext: Boolean = idx < n && off + 4 <= bytes.length && {
        val len = ByteBuffer.wrap(bytes, off, 4).getInt
        // Long bound: see actualFrameCount — Int wrap on corrupt lengths
        len >= 0 && off.toLong + 4 + len <= bytes.length
      }
      def next(): (Int, Array[Byte]) = {
        val len = ByteBuffer.wrap(bytes, off, 4).getInt
        val frame = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len)
        off += 4 + len
        idx += 1
        (idx - 1, frame)
      }
    }
    Some(it)
  }
}

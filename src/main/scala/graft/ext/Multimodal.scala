package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct.
  *
  * Decode status: IMAGE (PNG/JPEG/GIF/BMP), WAVE-PCM audio, and
  * MJPEG-AVI VIDEO decode are all REAL — [[decodeMedia]] /
  * [[decodeVideoFrames]] run the JDK's own codecs (ImageIO /
  * AudioSystem, no external libraries) inside `mapPartitions`; video
  * needs no codec beyond them because an MJPEG AVI is a RIFF walk
  * plus one complete JPEG per frame. [[decodeStub]] remains as the
  * deterministic text-payload stand-in the synthetic-corpus gates
  * value-check. Inter-frame codecs (H.264 …) would mount a JNI /
  * library call into the same mapPartitions seam — schemas, batching
  * and downstream queries are already in place.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the layout a 100 TB
    * multimodal lakehouse table would use; payload column stays
    * opaque so parquet never decodes it on metadata-only queries). */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features per media row. */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  /** Build a media table from the documents table: payload = UTF-8
    * bytes of the text (deterministic stand-in for real blobs). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // stable pseudo-modality per row
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
      (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decode: a deterministic 8-dim "feature vector" derived from
    * payload bytes. Real implementation would decode the media and run
    * a feature extractor here — per partition, batched, no driver
    * involvement. The imperative per-partition loop is exactly where a
    * native decoder would sit (mapPartitions keeps library handles
    * open across rows instead of per-row init). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Frame sampling: every `stride`-th fixed-size block of the media
    * content — the shape of key-frame extraction for video training
    * data (sample, don't decode everything). The deterministic
    * stand-in defines a "frame" as a `frameChars`-character block of
    * the text payload (a real build swaps block slicing for codec
    * keyframe offsets; the sampling arithmetic, lazy per-row
    * evaluation and downstream schema stay identical). Pure map, no
    * shuffle — sampling 100 TB of video touches each row once and
    * reads only the sampled blocks. */
  def sampleFrames(content: Column, frameChars: Int, stride: Int): Column = {
    val nFrames = ceil(length(content).cast("double") / frameChars).cast("int")
    val idx = filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % stride === 0 && i < nFrames)
    transform(idx, i => content.substr(i * frameChars + 1, lit(frameChars)))
  }

  // ---- real container headers: synthesis + parsing ----------------
  //
  // Independent of the real decode path above, container-header
  // parsing is plain byte arithmetic — a real
  // data-quality operator for a multimodal lakehouse (declared
  // metadata lies; the bytes don't). Payloads are synthesized with
  // spec-conformant PNG (signature + IHDR + CRC-32) and canonical
  // RIFF/WAVE headers, and the parsers read dimensions / channel
  // layout back from the BYTES via codegen'd built-ins
  // (substring/hex/conv/crc32 on binary) — no UDFs, scan-speed.
  // Format layouts follow the public PNG (RFC 2083) and RIFF/WAVE
  // specifications; MediaHeaderSpec proves the parsers against
  // payloads written by the JDK's own ImageIO / AudioSystem encoders.

  /** Hex of a non-negative int column, left-padded to exactly
    * `bytes` bytes. An out-of-range value fails the job with a clear
    * message instead of silently truncating (lpad KEEPS the first
    * 2·bytes chars of a longer string, which would corrupt the
    * encoded field — e.g. width 70000 in a 2-byte field would write
    * 4375 with no error and send a test chasing a phantom parser
    * bug). */
  private def hexN(x: Column, bytes: Int): Column = {
    val v = x.cast("long")
    val checked = when(v >= 0L && v < lit(1L << (8 * bytes)), v)
      .otherwise(raise_error(concat(
        lit(s"media header field out of range for $bytes byte(s): "), v.cast("string"))))
    lpad(hex(checked), bytes * 2, "0")
  }

  /** `bytes`-byte big-endian encoding of a non-negative int column. */
  private def be(x: Column, bytes: Int): Column = unhex(hexN(x, bytes))

  /** 4-byte big-endian encoding of a non-negative int column. */
  private def be4(x: Column): Column = be(x, 4)

  /** `bytes`-byte little-endian encoding of a non-negative int column. */
  private def le(x: Column, bytes: Int): Column = {
    val h = hexN(x, bytes)
    unhex(concat((0 until bytes).map(b => substring(h, (bytes - 1 - b) * 2 + 1, 2)): _*))
  }

  /** Little-endian int read from `bytes` bytes at 1-indexed `pos`. */
  private def leInt(p: Column, pos: Int, bytes: Int): Column =
    conv(concat((0 until bytes).map(b => hex(substring(p, pos + bytes - 1 - b, 1))): _*),
      16, 10).cast("long")

  /** A valid PNG prefix (signature + IHDR chunk incl. CRC-32 over
    * type+data, 8-bit RGBA) followed by `body` as the opaque
    * remainder. */
  def pngPayload(width: Column, height: Column, body: Column): Column = {
    val chunk = concat(lit("IHDR").cast("binary"),
      be4(width), be4(height), unhex(lit("0806000000")))
    concat(unhex(lit("89504E470D0A1A0A")), be4(lit(13)), chunk, be4(crc32(chunk)), body)
  }

  /** A canonical RIFF/WAVE header (PCM fmt chunk + data chunk) with
    * `body` as the sample data. */
  def wavPayload(channels: Column, sampleRate: Column, body: Column): Column = {
    val dataLen = octet_length(body).cast("long")
    val fmt = concat(le(lit(1), 2), le(channels, 2), le(sampleRate, 4),
      le(sampleRate * channels * 2, 4), le(channels * 2, 2), le(lit(16), 2))
    concat(lit("RIFF").cast("binary"), le(dataLen + lit(36L), 4),
      lit("WAVE").cast("binary"), lit("fmt ").cast("binary"), le(lit(16), 4), fmt,
      lit("data").cast("binary"), le(dataLen, 4), body)
  }

  /** PNG structural validity: signature, leading IHDR chunk, and the
    * stored CRC-32 matching a recomputation over type+data — a flipped
    * header byte fails here, not downstream. */
  def pngValid(p: Column): Column =
    hex(substring(p, 1, 8)) === "89504E470D0A1A0A" &&
      substring(p, 13, 4) === lit("IHDR").cast("binary") &&
      crc32(substring(p, 13, 17)) === conv(hex(substring(p, 30, 4)), 16, 10).cast("long")

  /** Parsed IHDR width/height (big-endian at offsets 17/21); null for
    * anything that is not a CRC-valid PNG. */
  def pngWidth(p: Column): Column =
    when(pngValid(p), conv(hex(substring(p, 17, 4)), 16, 10).cast("long"))
  def pngHeight(p: Column): Column =
    when(pngValid(p), conv(hex(substring(p, 21, 4)), 16, 10).cast("long"))

  /** WAVE structural validity: RIFF/WAVE magic, a leading 16-byte PCM
    * fmt chunk. */
  def wavValid(p: Column): Column =
    substring(p, 1, 4) === lit("RIFF").cast("binary") &&
      substring(p, 9, 4) === lit("WAVE").cast("binary") &&
      substring(p, 13, 4) === lit("fmt ").cast("binary") &&
      leInt(p, 17, 4) === 16 && leInt(p, 21, 2) === 1

  /** Parsed PCM channel count / sample rate (little-endian at offsets
    * 23/25); null for anything that is not a canonical PCM WAVE. */
  def wavChannels(p: Column): Column = when(wavValid(p), leInt(p, 23, 2))
  def wavSampleRate(p: Column): Column = when(wavValid(p), leInt(p, 25, 4))

  // ---- JPEG: SOF segment walk ---------------------------------------
  //
  // Unlike PNG (dimensions at a fixed IHDR offset) a JPEG's SOF frame
  // header sits behind a variable prefix of APPn/DQT/COM segments, so
  // parsing dimensions requires an actual segment walk: each segment
  // is FF <code> <len:2 BE> <payload>, `len` counting itself. The
  // walk is a bounded `aggregate` HOF fold over (pos, sofPos) state —
  // per-row work capped at `maxSegs` tiny substring reads, zero
  // shuffle, no UDF. Layout follows the public JPEG/JFIF
  // specification (ITU T.81 §B.2); standalone markers (RSTn/TEM,
  // which carry no length) never precede SOF in a conforming file, so
  // the walk treats any non-FF byte as the end of the parseable
  // header. MediaHeaderSpec proves the walk against the JDK ImageIO
  // JPEG encoder's output (APP0 + DQT×2 + SOF0 + DHT×4 + SOS).

  /** Big-endian int read from `bytes` bytes at a DYNAMIC 1-indexed
    * position column (hex of a multi-byte slice is already
    * big-endian); null when the slice runs past the payload. */
  private def beIntAt(p: Column, pos: Column, bytes: Int): Column = {
    val h = hex(p.substr(pos, lit(bytes)))
    when(length(h) === bytes * 2, conv(h, 16, 10).cast("long"))
  }

  /** 1-indexed position of the SOF0–SOF3 marker (FF C0..C3), or 0
    * when no SOF segment appears within the first `maxSegs` segments.
    * SOF0 = baseline, SOF2 = progressive — both carry dimensions at
    * the same offsets. */
  def jpegSofPos(p: Column, maxSegs: Int = 16): Column =
    aggregate(sequence(lit(1), lit(maxSegs)),
      struct(lit(3L).as("pos"), lit(0L).as("sof")),
      (st, _) => {
        val pos = st.getField("pos")
        val sof = st.getField("sof")
        // marker byte + code, read as one 2-byte slice ('' past end)
        val twoAt = hex(p.substr(pos, lit(2)))
        val isMarker = substring(twoAt, 1, 2) === lit("FF")
        val code = conv(substring(twoAt, 3, 2), 16, 10).cast("long")
        val isSof = coalesce(code >= 0xC0L && code <= 0xC3L, lit(false))
        // jump past a non-SOF segment; a truncated length field jumps
        // off the end, which the next iteration reads as done
        val segLen = coalesce(beIntAt(p, pos + 2, 2), lit(1L << 30))
        val halt = sof > 0 || !isMarker || isSof
        struct(
          when(halt, pos).otherwise(pos + 2 + segLen).as("pos"),
          when(sof > 0, sof)
            .when(isMarker && isSof, pos)
            .otherwise(lit(0L)).as("sof"))
      }).getField("sof")

  /** JPEG structural validity: SOI signature and an SOF0–SOF3 frame
    * header found by the segment walk. `maxSegs` bounds the walk —
    * raise it for files with long metadata prefixes (an ICC profile
    * over 64 KB is chunked across many APP2 segments). */
  def jpegValid(p: Column, maxSegs: Int = 16): Column =
    hex(p.substr(lit(1), lit(2))) === lit("FFD8") && jpegSofPos(p, maxSegs) > 0

  /** Parsed frame dimensions (big-endian at SOF+7 / SOF+5 — after
    * marker(2), length(2), precision(1), height(2)); null for
    * anything that is not a walkable JPEG. Each accessor re-runs the
    * bounded walk — batch the three into one select when all are
    * needed; the per-row cost stays `maxSegs` substring reads. */
  def jpegWidth(p: Column, maxSegs: Int = 16): Column =
    when(jpegValid(p, maxSegs), beIntAt(p, jpegSofPos(p, maxSegs) + 7, 2))
  def jpegHeight(p: Column, maxSegs: Int = 16): Column =
    when(jpegValid(p, maxSegs), beIntAt(p, jpegSofPos(p, maxSegs) + 5, 2))

  /** True for a progressive (SOF2) frame, false for baseline et al.;
    * null when not a walkable JPEG. */
  def jpegProgressive(p: Column, maxSegs: Int = 16): Column =
    when(jpegValid(p, maxSegs), beIntAt(p, jpegSofPos(p, maxSegs) + 1, 1) === 0xC2L)

  /** A conformant JPEG header prefix — SOI, APP0/JFIF, a flat DQT,
    * and an SOF0 (or SOF2 when `progressive`) frame header for a
    * 3-component 4:4:4 image — followed by `body` as the opaque
    * remainder (entropy-coded data stands in, exactly like the PNG
    * body). */
  def jpegPayload(width: Column, height: Column, body: Column,
                  progressive: Column = lit(false)): Column = {
    val app0 = "FFE000104A46494600010100000100010000"
    val dqt = "FFDB004300" + "10" * 64
    val sof = concat(
      unhex(when(progressive, lit("C2")).otherwise(lit("C0"))),
      unhex(lit("001108")), be(height, 2), be(width, 2),
      unhex(lit("03011100021101031101")))
    concat(unhex(lit("FFD8" + app0 + dqt + "FF")), sof, body)
  }

  // ---- MP4 / ISO-BMFF (ISO/IEC 14496-12): the fourth container.
  // An MP4 file is a sequence of length-prefixed boxes —
  // size(4, big-endian, includes the 8-byte header) + type(4 ascii)
  // — nested by containment. The movie header (moov/mvhd) carries
  // timescale and duration; reading them is pure box-walk byte
  // arithmetic, the same substring/conv technique as the JPEG
  // segment walk. 64-bit "largesize" boxes (size field = 1) and
  // mvhd version 1 (64-bit times) parse as null — an honest bound,
  // like the JPEG walk's maxSegs.

  /** 1-indexed position of the first box of `tpe` in `[start,
    * start+limit)`, walking at most `maxBoxes` sibling boxes; 0 when
    * absent. A malformed size (< 8, or a truncated read) halts the
    * walk. */
  private def boxPosIn(p: Column, start: Column, limit: Column,
                       tpe: String, maxBoxes: Int): Column =
    aggregate(sequence(lit(1), lit(maxBoxes)),
      struct(start.as("pos"), lit(0L).as("hit")),
      (st, _) => {
        val pos = st.getField("pos")
        val hit = st.getField("hit")
        val size = beIntAt(p, pos, 4)
        val ok = coalesce(size >= 8 && pos < start + limit, lit(false))
        val isHit = ok && p.substr(pos + 4, lit(4)).cast("string") === lit(tpe)
        val halt = hit > 0 || !ok || isHit
        struct(
          when(halt, pos).otherwise(pos + size).as("pos"),
          when(hit > 0, hit).when(isHit, pos).otherwise(lit(0L)).as("hit"))
      }).getField("hit")

  /** 1-indexed position of moov/mvhd, or 0 when the box tree lacks
    * it (within `maxBoxes` siblings at each of the two levels). */
  def mp4MvhdPos(p: Column, maxBoxes: Int = 8): Column = {
    val moov = boxPosIn(p, lit(1L), octet_length(p).cast("long"), "moov", maxBoxes)
    when(moov > 0,
      boxPosIn(p, moov + 8, beIntAt(p, moov, 4) - 8, "mvhd", maxBoxes))
      .otherwise(lit(0L))
  }

  /** MP4 structural validity: leading ftyp box and a version-0 mvhd
    * reachable by the box walk. */
  def mp4Valid(p: Column, maxBoxes: Int = 8): Column = {
    val mvhd = mp4MvhdPos(p, maxBoxes)
    p.substr(lit(5), lit(4)).cast("string") === lit("ftyp") &&
      mvhd > 0 && coalesce(beIntAt(p, mvhd + 8, 1) === 0L, lit(false))
  }

  /** mvhd fields (version 0: timescale at box offset 20, duration in
    * timescale ticks at 24); null for anything that is not a
    * walkable MP4. Batch into one select when all are needed — each
    * accessor re-runs the bounded walk. */
  def mp4Timescale(p: Column, maxBoxes: Int = 8): Column =
    when(mp4Valid(p, maxBoxes), beIntAt(p, mp4MvhdPos(p, maxBoxes) + 20, 4))
  def mp4Duration(p: Column, maxBoxes: Int = 8): Column =
    when(mp4Valid(p, maxBoxes), beIntAt(p, mp4MvhdPos(p, maxBoxes) + 24, 4))

  /** Duration in integer milliseconds — `ticks * 1000 div timescale`
    * (floor division, engine-portable like the PMI/PageRank scores). */
  def mp4DurationMs(p: Column, maxBoxes: Int = 8): Column =
    call_function("div", mp4Duration(p, maxBoxes) * 1000L, mp4Timescale(p, maxBoxes))

  /** A conformant MP4 header — ftyp(isom) + moov containing a full
    * 108-byte version-0 mvhd (identity matrix, rate 1.0) — followed
    * by `body` wrapped as the mdat box payload. */
  def mp4Payload(timescale: Column, durationTicks: Column, body: Column): Column = {
    val ftyp = "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"
    // moov size 116 = 8 + mvhd 108; mvhd: header, v0+flags, ctime,
    // mtime, then timescale/duration columns, then rate, volume+
    // reserved, reserved(8), unity matrix, pre_defined(24), next id
    val moovPre = "00000074" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"
    val mvhdPost = "00010000" + "01000000" + "00000000" + "00000000" +
      "00010000" + "00000000" + "00000000" +
      "00000000" + "00010000" + "00000000" +
      "00000000" + "00000000" + "40000000" +
      "00000000" * 6 + "00000002"
    concat(unhex(lit(ftyp + moovPre)), be4(timescale), be4(durationTicks),
      unhex(lit(mvhdPost)),
      be4(octet_length(body).cast("long") + 8L), unhex(lit("6D646174")), body)
  }

  /** Media table with REAL container headers: image rows carry a
    * valid PNG prefix (dimensions from the declared-metadata formula),
    * audio rows a canonical WAVE header, video rows stay opaque (no
    * single-file header to parse without a codec). Declared metadata
    * columns carry the true values — validation queries corrupt them
    * deliberately to prove the parser catches lies. */
  def mediaWithHeaders(docs: DataFrame): DataFrame = {
    val body = encode(col("text"), "UTF-8")
    val m = pmod(col("doc_id"), lit(3))
    val width = (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int")
    val height = (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int")
    val channels = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
    val sampleRate = lit(16000)
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (m + 1).cast("int")).as("modality"),
      when(m === 0, pngPayload(width, height, body))
        .when(m === 1, wavPayload(channels, sampleRate, body))
        .otherwise(body).as("payload"),
      width.as("width"), height.as("height"),
      channels.as("channels"), sampleRate.cast("int").as("sample_rate"))
  }

  case class DecodedMedia(media_id: Long, kind: String, ok: Boolean,
                          width: Int, height: Int, channels: Int,
                          m0: Double, m1: Double, m2: Double)

  /** REAL media decode — no external libraries: the JDK itself ships
    * codecs, and they run fine inside executors. PNG/JPEG/GIF/BMP
    * decode via `ImageIO` (pixel means per RGB channel, exact for
    * lossless formats), WAVE PCM via `AudioSystem` (mean |sample| and
    * zero-crossing count — the cheap audio fingerprints). Video has
    * no JDK codec and reports `ok = false` (the one remaining honest
    * gap). Decoding happens in `mapPartitions` — per-partition,
    * batched, no driver involvement, the exact seam where a JNI/
    * native decoder would mount for other formats.
    *
    * Output per row: `(media_id, kind, ok, width, height, channels,
    * m0, m1, m2)` — image: m0/m1/m2 = mean R/G/B over `getRGB`
    * (sRGB, lossless round-trip ⇒ exact for solid fills); audio:
    * m0 = sample rate, m1 = mean |sample|, m2 = zero crossings. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) => decodeOne(id, payload) }
      }
  }

  /** Single-payload decode (shared by the Dataset operator and
    * specs): try image first, then audio, else unsupported. */
  def decodeOne(id: Long, payload: Array[Byte]): DecodedMedia = {
    def asImage: Option[DecodedMedia] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Some(DecodedMedia(id, "image", ok = true, w, h,
            img.getColorModel.getNumComponents,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
        }
      } catch { case _: Throwable => None }
    def asAudio: Option[DecodedMedia] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val ch = fmt.getChannels
          // Multi-channel PCM interleaves samples frame-by-frame
          // (L R L R …): the signal stats must deinterleave first, or
          // a constant stereo signal reads as maximally oscillating
          // (zero-crossings counted across the channel boundary).
          // Stride-by-channel: zc = per-channel crossings, summed;
          // mean |sample| over the whole (complete) frames.
          val nf = bytes.length / 2 / math.max(ch, 1)
          var sumAbs = 0L; var zc = 0L
          var c = 0
          while (c < ch) {
            var prevSign = 0
            var f = 0
            while (f < nf) {
              val i = f * ch + c
              val lo = bytes(2 * i + (if (bigEndian) 1 else 0)) & 0xff
              val hi = bytes(2 * i + (if (bigEndian) 0 else 1))
              val s = (hi << 8) | lo
              sumAbs += math.abs(s)
              val sign = Integer.signum(s)
              if (sign != 0) {
                if (prevSign != 0 && sign != prevSign) zc += 1
                prevSign = sign
              }
              f += 1
            }
            c += 1
          }
          val n = nf.toLong * ch
          Some(DecodedMedia(id, "audio", ok = true, 0, 0, ch,
            fmt.getSampleRate.toDouble, if (n == 0) 0.0 else sumAbs.toDouble / n,
            zc.toDouble))
        }
      } catch { case _: Throwable => None }
    // MJPEG AVI: decode every frame through the image path and fold
    // per-frame means into pixel-weighted whole-clip means. In the
    // summary schema width/height come from the first decoded frame
    // and `channels` carries the FRAME COUNT (documented overload —
    // the per-frame shape lives in [[decodeVideoFrames]]). ok only
    // when every frame decoded.
    def asVideo: Option[DecodedMedia] =
      aviFramePayloads(payload).map { frames =>
        val decoded = frames.map(f => decodeOne(id, f))
        val good = decoded.filter(d => d.kind == "image" && d.ok)
        if (decoded.isEmpty || good.size != decoded.size)
          DecodedMedia(id, "video", ok = false, 0, 0, frames.size, 0.0, 0.0, 0.0)
        else {
          val px = good.map(d => d.width.toLong * d.height)
          val n = px.sum.toDouble
          def mean(sel: DecodedMedia => Double): Double =
            good.zip(px).map { case (d, p) => sel(d) * p }.sum / n
          DecodedMedia(id, "video", ok = true, good.head.width, good.head.height,
            frames.size, mean(_.m0), mean(_.m1), mean(_.m2))
        }
      }
    asImage.orElse(asVideo).orElse(asAudio).getOrElse(
      DecodedMedia(id, "unsupported", ok = false, 0, 0, 0, 0.0, 0.0, 0.0))
  }

  // ---- AVI / RIFF: column-level header parse (the FIFTH container:
  // PNG fixed-offset, WAVE chunk scan, JPEG segment walk, MP4 nested
  // big-endian boxes — and now RIFF's little-endian chunk walk). An
  // AVI's main header (LIST hdrl → avih) declares frame count,
  // per-frame µs and dimensions; reading them back from the BYTES is
  // the same codegen'd substring/conv arithmetic as the other four,
  // zero UDFs, scan-speed. Layout follows the public AVI RIFF File
  // Reference (Microsoft).

  /** Little-endian int read from `bytes` bytes at a DYNAMIC 1-indexed
    * position column; null when the slice runs past the payload. */
  private def leIntAt(p: Column, pos: Column, bytes: Int): Column = {
    val h = concat((0 until bytes).reverse.map(b => hex(p.substr(pos + b, lit(1)))): _*)
    when(length(h) === bytes * 2, conv(h, 16, 10).cast("long"))
  }

  /** 1-indexed position of the first RIFF chunk with `id` (and, when
    * given, LIST type `listType`) among siblings in `[start, start +
    * limit)`, walking at most `maxChunks`; 0 when absent. Chunk =
    * id(4) + size(4 LE, data only) + data, padded to even. */
  private def riffChunkPos(p: Column, start: Column, limit: Column,
                           id: String, listType: Option[String],
                           maxChunks: Int): Column =
    aggregate(sequence(lit(1), lit(maxChunks)),
      struct(start.as("pos"), lit(0L).as("hit")),
      (st, _) => {
        val pos = st.getField("pos")
        val hit = st.getField("hit")
        val size = leIntAt(p, pos + 4, 4)
        val ok = coalesce(size >= 0L && pos + 8 <= start + limit, lit(false))
        val idHit = ok && p.substr(pos, lit(4)).cast("string") === lit(id)
        val isHit = listType.fold(idHit)(t =>
          idHit && p.substr(pos + 8, lit(4)).cast("string") === lit(t))
        val halt = hit > 0 || !ok || isHit
        struct(
          when(halt, pos)
            .otherwise(pos + 8 + size + pmod(size, lit(2L))).as("pos"),
          when(hit > 0, hit).when(isHit, pos).otherwise(lit(0L)).as("hit"))
      }).getField("hit")

  /** Bind `v` ONCE as a lambda variable in `f` — the expression-level
    * let-binding: `transform(array(v), x -> f(x))[0]`. Catalyst has
    * no CSE across an expression TREE (each `val` reuse of a Column
    * splices another copy of the subtree in, and analyzer transforms
    * then copy each occurrence separately — a walk expression
    * referenced a handful of times over a synthesized payload tree
    * was measured to OOM 8 GiB at ANALYSIS time), but a higher-order-
    * function lambda variable is evaluated once and referenced by
    * slot. */
  private def bindOnce(v: Column, f: Column => Column): Column =
    get(transform(array(v), f), lit(0))

  /** 1-indexed position of the avih main-header chunk (inside LIST
    * hdrl), or 0 when the chunk tree lacks it. */
  def aviAvihPos(p: Column, maxChunks: Int = 8): Column =
    bindOnce(
      riffChunkPos(p, lit(13L), octet_length(p).cast("long") - 12L,
        "LIST", Some("hdrl"), maxChunks),
      hdrl => when(hdrl > 0,
        riffChunkPos(p, hdrl + 12, leIntAt(p, hdrl + 4, 4) - 4, "avih", None, maxChunks))
        .otherwise(lit(0L)))

  /** All avih fields from ONE chunk walk:
    * `struct(valid, uspf, frames, w, h)` — `valid` = RIFF/'AVI '
    * magic + a full 56-byte avih; the rest little-endian reads at
    * avih data offsets 0 / 16 / 32 / 36, null when not a walkable
    * AVI. Use THIS (not several single-field accessors) when a query
    * needs more than one field: each accessor embeds its own bounded
    * walk, and the walk subtree is the expensive part of the tree. */
  def aviInfo(p: Column, maxChunks: Int = 8): Column =
    bindOnce(aviAvihPos(p, maxChunks), pos =>
      bindOnce(
        p.substr(lit(1), lit(4)).cast("string") === lit("RIFF") &&
          p.substr(lit(9), lit(4)).cast("string") === lit("AVI ") &&
          pos > 0 && coalesce(leIntAt(p, pos + 4, 4) >= 56L, lit(false)),
        valid => struct(
          valid.as("valid"),
          when(valid, leIntAt(p, pos + 8, 4)).as("uspf"),
          when(valid, leIntAt(p, pos + 24, 4)).as("frames"),
          when(valid, leIntAt(p, pos + 40, 4)).as("w"),
          when(valid, leIntAt(p, pos + 44, 4)).as("h"))))

  /** AVI structural validity: RIFF/'AVI ' magic and a full 56-byte
    * avih reachable by the chunk walk. */
  def aviValid(p: Column, maxChunks: Int = 8): Column =
    aviInfo(p, maxChunks).getField("valid")

  /** Single avih fields; null for anything that is not a walkable
    * AVI. Prefer [[aviInfo]] when several are needed. */
  def aviMicrosPerFrame(p: Column, maxChunks: Int = 8): Column =
    aviInfo(p, maxChunks).getField("uspf")
  def aviTotalFrames(p: Column, maxChunks: Int = 8): Column =
    aviInfo(p, maxChunks).getField("frames")
  def aviWidth(p: Column, maxChunks: Int = 8): Column =
    aviInfo(p, maxChunks).getField("w")
  def aviHeight(p: Column, maxChunks: Int = 8): Column =
    aviInfo(p, maxChunks).getField("h")

  /** A conformant AVI header prefix — RIFF('AVI ') + LIST(hdrl){avih}
    * declaring `nFrames`/`width`/`height` at `fps` — followed by a
    * movi LIST wrapping `body` as a single '00dc' frame chunk (the
    * jpegPayload approach: a real header, opaque stand-in data).
    * Column-level synthesis for validation fixtures; [[aviMjpeg]] is
    * the JVM-side writer for genuinely decodable files. */
  def aviPayload(width: Column, height: Column, nFrames: Column,
                 body: Column, fps: Int = 25): Column = {
    // every chunk size derives ARITHMETICALLY from octet_length(body):
    // nesting octet_length(<composite concat>) would splice the whole
    // composite subtree in again per size field, and the tree size
    // compounds (measured: analysis-time OOM once a parser walk
    // referenced the payload) — the same discipline as the other
    // payload builders, just load-bearing at this nesting depth
    val bodyLen = octet_length(body).cast("long")
    val pad = pmod(bodyLen, lit(2L))
    val avih = concat(le(lit(1000000 / fps), 4), le(lit(0), 4), le(lit(0), 4),
      le(lit(0), 4), le(nFrames, 4), le(lit(0), 4), le(lit(1), 4), le(lit(0), 4),
      le(width, 4), le(height, 4), le(lit(0), 4), le(lit(0), 4), le(lit(0), 4),
      le(lit(0), 4))
    // layout: RIFF sz 'AVI ' | LIST 68 hdrl (avih 56 <data>) |
    //         LIST (12+body+pad) movi ('00dc' len body pad)
    val moviData = lit(12L) + bodyLen + pad
    val riffData = lit(4L) + lit(8L + 68L) + lit(8L) + moviData
    concat(lit("RIFF").cast("binary"), le(riffData, 4),
      lit("AVI ").cast("binary"),
      lit("LIST").cast("binary"), le(lit(68), 4), lit("hdrl").cast("binary"),
      lit("avih").cast("binary"), le(lit(56), 4), avih,
      lit("LIST").cast("binary"), le(moviData, 4), lit("movi").cast("binary"),
      lit("00dc").cast("binary"), le(bodyLen, 4), body,
      when(pad === 1L, unhex(lit("00"))).otherwise(lit(Array.emptyByteArray)))
  }

  // ---- AVI / RIFF (MJPEG): video decode without a video codec. -----
  //
  // The JDK ships no video decoder, but Motion-JPEG needs none: an
  // MJPEG AVI is a RIFF container whose 'movi' LIST holds one complete
  // JPEG per frame ('00dc' chunks), and the JDK's ImageIO JPEG codec
  // decodes each frame. The RIFF chunk walk below is the byte-level
  // sibling of the MP4 box walk above (4-byte id + 4-byte size,
  // little-endian here, chunks padded to even); layout follows the
  // public AVI RIFF specification (Microsoft "AVI RIFF File
  // Reference"). Synthesis writes a canonical single-stream header
  // (avih + strl/strh/strf) so the fixture files are conformant, and
  // the parser only trusts the bytes it walks.

  private def leIntAt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** JPEG frame payloads of an MJPEG AVI, in stream order; None when
    * the payload is not a walkable RIFF/AVI. The walk visits each top-
    * level chunk once and each 'movi' sub-chunk once — O(file bytes),
    * no allocation beyond the frame slices. Both '00dc' (compressed)
    * and '00db' (uncompressed DIB — still handed to ImageIO, which
    * rejects non-JPEG bytes downstream) frame ids are collected. */
  def aviFramePayloads(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") return None
    val end = math.min(payload.length, 8 + leIntAt(payload, 4))
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = 12
    var sane = true
    while (sane && pos + 8 <= end) {
      val id = fourcc(payload, pos)
      val size = leIntAt(payload, pos + 4)
      if (size < 0 || pos + 8 + size > end) sane = false
      else {
        if (id == "LIST" && size >= 4 && fourcc(payload, pos + 8) == "movi") {
          var sub = pos + 12
          val subEnd = pos + 8 + size
          while (sane && sub + 8 <= subEnd) {
            val sid = fourcc(payload, sub)
            val ssize = leIntAt(payload, sub + 4)
            if (ssize < 0 || sub + 8 + ssize > subEnd) sane = false
            else {
              if (sid.endsWith("dc") || sid.endsWith("db"))
                frames += java.util.Arrays.copyOfRange(payload, sub + 8, sub + 8 + ssize)
              sub += 8 + ssize + (ssize & 1) // chunks pad to even
            }
          }
        }
        pos += 8 + size + (size & 1)
      }
    }
    if (sane) Some(frames.result()) else None
  }

  /** A canonical single-stream MJPEG AVI containing `frames` (each a
    * complete JPEG), for fixtures and specs: RIFF('AVI ') →
    * LIST(hdrl){avih, LIST(strl){strh('vids'/'MJPG'), strf(BITMAP-
    * INFOHEADER)}} → LIST(movi){'00dc' per frame}. Driver-side
    * bounded synthesis, the q_src_csv fixture contract. */
  def aviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
               fps: Int = 25): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val bos = new java.io.ByteArrayOutputStream()
    def le4(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le2(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
      cc(id) ++ le4(body.length) ++ body ++ pad
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(tpe) ++ body)
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le4(1000000 / fps) ++ le4(0) ++ le4(0) ++ le4(0) ++
      le4(frames.length) ++ le4(0) ++ le4(1) ++ le4(maxFrame) ++
      le4(width) ++ le4(height) ++ le4(0) ++ le4(0) ++ le4(0) ++ le4(0)
    val strh = cc("vids") ++ cc("MJPG") ++ le4(0) ++ le2(0) ++ le2(0) ++
      le4(0) ++ le4(1) ++ le4(fps) ++ le4(0) ++ le4(frames.length) ++
      le4(maxFrame) ++ le4(0) ++ le4(0) ++
      le2(0) ++ le2(0) ++ le2(width) ++ le2(height)
    val strf = le4(40) ++ le4(width) ++ le4(height) ++ le2(1) ++ le2(24) ++
      cc("MJPG") ++ le4(width * height * 3) ++ le4(0) ++ le4(0) ++ le4(0) ++ le4(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map(f => chunk("00dc", f)).fold(Array.emptyByteArray)(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(le4(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** A solid-gray JPEG via the JDK encoder. Gray is the deliberate
    * fixture color: for a constant gray plane Y = v and Cb = Cr = 128
    * exactly, every AC coefficient is 0, and the DC term 8·(v−128) is
    * divisible by any integer quantizer step — so the lossy JPEG
    * round-trip is EXACT and per-frame means stay oracle-checkable
    * (VideoSpec pins this). */
  def grayJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, width, height); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  case class VideoFrame(media_id: Long, frame_idx: Int, ok: Boolean,
                        width: Int, height: Int, m0: Double, m1: Double, m2: Double)

  /** REAL video decode: per-frame rows from MJPEG AVI payloads —
    * RIFF walk to the '00dc' frames, ImageIO JPEG decode per frame,
    * per-frame RGB means. `stride` samples every stride-th frame and
    * SKIPS the JPEG decode of unsampled frames entirely (at 100 TB,
    * keyframe sampling must not pay for the frames it drops; the RIFF
    * walk itself reads only chunk headers). A non-AVI payload yields
    * one `frame_idx = -1, ok = false` row — nothing disappears
    * silently; an undecodable frame inside a valid AVI yields its row
    * with `ok = false`. Runs in `mapPartitions`: batched, executor-
    * side, no driver involvement. */
  def decodeVideoFrames(spark: SparkSession, media: DataFrame,
                        stride: Int = 1): Dataset[VideoFrame] = {
    import spark.implicits._
    require(stride > 0, "stride must be positive")
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          aviFramePayloads(payload) match {
            case None =>
              Iterator.single(VideoFrame(id, -1, ok = false, 0, 0, 0.0, 0.0, 0.0))
            case Some(frames) =>
              frames.iterator.zipWithIndex
                .filter { case (_, i) => i % stride == 0 }
                .map { case (bytes, i) =>
                  decodeOne(id, bytes) match {
                    case DecodedMedia(_, "image", true, w, h, _, m0, m1, m2) =>
                      VideoFrame(id, i, ok = true, w, h, m0, m1, m2)
                    case _ => VideoFrame(id, i, ok = false, 0, 0, 0.0, 0.0, 0.0)
                  }
                }
          }
        }
      }
  }

  case class ResizedMedia(media_id: Long, ok: Boolean, payload: Array[Byte])

  /** REAL image resize — decode (ImageIO), nearest-neighbor rescale
    * (Graphics2D), re-encode PNG — in `mapPartitions`: the standard
    * normalize-resolution step before a vision encoder, batched per
    * partition with no driver involvement. Nearest-neighbor is chosen
    * deliberately: it is bit-deterministic across JVMs (no filter
    * kernels, no rounding-mode ambiguity), which keeps resized
    * payloads oracle-checkable; swap the rendering hint for bilinear
    * in production if smoothness beats determinism. Non-image
    * payloads pass through with `ok = false` and an empty payload. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(width > 0 && height > 0, "target dims must be positive")
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            if (img == null) ResizedMedia(id, ok = false, Array.emptyByteArray)
            else {
              val out = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
              g.drawImage(img, 0, 0, width, height, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedMedia(id, ok = true, bos.toByteArray)
            }
          } catch { case _: Throwable => ResizedMedia(id, ok = false, Array.emptyByteArray) }
        }
      }
  }

  /** Feature extraction over the media table — Dataset + mapPartitions
    * (the Scala analogue of mapInPandas batch processing). The
    * checksum is the 31-polynomial rolling hash of the payload bytes
    * mod 1e9+7 — for ASCII payloads it coincides with
    * [[graft.functions.RollingHash]] over the text, which is what
    * lets the driver gate value-check the mapPartitions plumbing in
    * DuckDB (an unreduced 64-bit product would wrap, and BIGINT
    * overflow is an error, not a wrap, in ANSI engines). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        var crc = 0L
        var i = 0
        while (i < r.payload.length) {
          crc = (crc * 31 + (r.payload(i) & 0xff)) % 1000000007L
          i += 1
        }
        MediaFeatures(r.media_id, r.modality, r.payload.length, crc, decodeStub(r.payload))
      }
    }
  }

  case class ImageHashes(media_id: Long, ok: Boolean, ahash: Long, dhash: Long)

  /** Perceptual image hashes for near-duplicate IMAGE dedup — the
    * multimodal twin of MinHash/SimHash on text: re-encodes,
    * recompressions and uniform brightness shifts keep the hash
    * (dedup joins on it or on small Hamming balls via
    * `bit_count(ahash ^ other)`), while different content diverges.
    *
    *  - `ahash` (average hash): NN-downsample to an 8×8 grayscale
    *    grid, bit k = y·8+x set iff `g·64 ≥ Σg` (the integer-exact
    *    form of g ≥ mean — no division, no rounding ambiguity).
    *  - `dhash` (gradient hash): 9×8 grid, bit set iff the pixel is
    *    STRICTLY brighter than its left neighbour — robust to any
    *    monotone brightness change, not just uniform shifts.
    *
    * Every step is integer arithmetic over decoded sRGB bytes: NN
    * sample at `(gx·W) div GW`, grayscale `(299r + 587g + 114b) div
    * 1000` (exact identity on gray fixtures since the weights sum to
    * 1000) — so a SQL oracle reproduces both hashes bit-for-bit from
    * the fixture pixel formulas. Decode failures yield
    * `ok = false, 0, 0`. Runs inside the same mapPartitions seam as
    * [[decodeMedia]] — per-row work, no shuffle; at scale the hash
    * column is the join/group key, so the dedup itself is ONE
    * shuffle of 8-byte keys, never of payloads. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHashes] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, payload) => imageHashOne(id, payload) })
  }

  /** Single-payload hash (shared with specs). */
  def imageHashOne(id: Long, payload: Array[Byte]): ImageHashes = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) ImageHashes(id, ok = false, 0L, 0L)
      else {
        def gray(gx: Int, gy: Int, gw: Int, gh: Int): Int = {
          val sx = gx * img.getWidth / gw
          val sy = gy * img.getHeight / gh
          val rgb = img.getRGB(sx, sy)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        val g8 = Array.tabulate(8, 8)((gy, gx) => gray(gx, gy, 8, 8))
        val sum = g8.map(_.sum).sum.toLong
        var ah = 0L
        var k = 0
        while (k < 64) {
          if (g8(k / 8)(k % 8).toLong * 64L >= sum) ah |= 1L << k
          k += 1
        }
        val g9 = Array.tabulate(8, 9)((gy, gx) => gray(gx, gy, 9, 8))
        var dh = 0L
        k = 0
        while (k < 64) {
          val gy = k / 8; val gx = k % 8
          if (g9(gy)(gx + 1) > g9(gy)(gx)) dh |= 1L << k
          k += 1
        }
        ImageHashes(id, ok = true, ah, dh)
      }
    } catch { case _: Throwable => ImageHashes(id, ok = false, 0L, 0L) }
  }
}

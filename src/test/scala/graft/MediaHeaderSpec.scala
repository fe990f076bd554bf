package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Container-header parsing proven against INDEPENDENT encoders: the
  * JDK's own ImageIO (PNG) and AudioSystem (WAVE) writers produce the
  * golden payloads, so a construction/parse bug that round-trips
  * through our own synthesizers cannot hide. Plus CRC tamper
  * detection: a single flipped header byte must null the parse.
  */
class MediaHeaderSpec extends AnyFunSuite with SharedSpark {

  test("PNG parser reads ImageIO-written files (independent encoder)") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val rows = Seq((37, 23), (1280, 832), (1, 1)).map { case (w, h) =>
      val bos = new ByteArrayOutputStream()
      ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB), "png", bos)
      (w, h, bos.toByteArray)
    }
    rows.toDF("w", "h", "payload")
      .select(col("w").cast("long"), col("h").cast("long"),
        Multimodal.pngWidth(col("payload")).as("pw"),
        Multimodal.pngHeight(col("payload")).as("ph"))
      .collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(0), "width")
        assert(r.getLong(3) === r.getLong(1), "height")
      }
  }

  test("WAVE parser reads AudioSystem-written files (independent encoder)") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val rows = Seq((1, 8000), (2, 44100)).map { case (ch, sr) =>
      val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(new Array[Byte](ch * 2 * 100)), fmt, 100)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      (ch, sr, bos.toByteArray)
    }
    rows.toDF("ch", "sr", "payload")
      .select(col("ch").cast("long"), col("sr").cast("long"),
        Multimodal.wavChannels(col("payload")).as("pc"),
        Multimodal.wavSampleRate(col("payload")).as("psr"))
      .collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(0), "channels")
        assert(r.getLong(3) === r.getLong(1), "sample rate")
      }
  }

  test("JPEG segment walk reads ImageIO-written files (independent encoder)") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // ImageIO's JPEG layout is SOI, APP0, DQT×2, SOF0, DHT×4, SOS —
    // the walk must skip a variable multi-segment prefix, not read a
    // fixed offset
    val rows = Seq((37, 23), (1280, 832), (1, 1)).map { case (w, h) =>
      val bos = new ByteArrayOutputStream()
      ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), "jpg", bos)
      (w, h, bos.toByteArray)
    }
    rows.toDF("w", "h", "payload")
      .select(col("w").cast("long"), col("h").cast("long"),
        Multimodal.jpegWidth(col("payload")).as("jw"),
        Multimodal.jpegHeight(col("payload")).as("jh"),
        Multimodal.jpegProgressive(col("payload")).as("prog"))
      .collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(0), "width")
        assert(r.getLong(3) === r.getLong(1), "height")
        assert(!r.getBoolean(4), "ImageIO writes baseline SOF0")
      }
  }

  test("synthesized JPEG round-trips; SOF2 flags progressive; non-JPEG nulls") {
    import spark.implicits._
    val row = Seq((640, 480)).toDF("w", "h")
      .select(
        Multimodal.jpegPayload(col("w"), col("h"),
          encode(lit("entropy-coded stand-in"), "UTF-8")).as("base"),
        Multimodal.jpegPayload(col("w"), col("h"),
          encode(lit("x"), "UTF-8"), progressive = lit(true)).as("prog"),
        encode(lit("just text, no SOI"), "UTF-8").as("raw"))
      .select(
        Multimodal.jpegWidth(col("base")), Multimodal.jpegHeight(col("base")),
        Multimodal.jpegProgressive(col("base")),
        Multimodal.jpegProgressive(col("prog")),
        Multimodal.jpegWidth(col("raw")))
      .head()
    assert(row.getLong(0) === 640L)
    assert(row.getLong(1) === 480L)
    assert(!row.getBoolean(2), "SOF0 is baseline")
    assert(row.getBoolean(3), "SOF2 flags progressive")
    assert(row.isNullAt(4), "non-JPEG bytes parse to null")
  }

  test("synthesized payloads round-trip; a flipped header byte fails the CRC") {
    import spark.implicits._
    val row = Seq((640, 480, "hello media body")).toDF("w", "h", "body")
      .select(Multimodal.pngPayload(col("w"), col("h"),
        encode(col("body"), "UTF-8")).as("p"))
      .select(
        Multimodal.pngWidth(col("p")),
        Multimodal.pngHeight(col("p")),
        Multimodal.pngWidth(concat(substring(col("p"), 1, 17),
          unhex(lit("FF")), substring(col("p"), 19, 1 << 20))).as("tampered"))
      .head()
    assert(row.getLong(0) === 640L)
    assert(row.getLong(1) === 480L)
    assert(row.isNullAt(2), "tampered width byte must fail the CRC recheck")
    val wrow = Seq((2, 16000, "x" * 64)).toDF("ch", "sr", "body")
      .select(Multimodal.wavPayload(col("ch"), col("sr"),
        encode(col("body"), "UTF-8")).as("p"))
      .select(Multimodal.wavChannels(col("p")), Multimodal.wavSampleRate(col("p")),
        octet_length(col("p")))
      .head()
    assert(wrow.getLong(0) === 2L)
    assert(wrow.getLong(1) === 16000L)
    assert(wrow.getInt(2) === 44 + 64, "canonical 44-byte WAVE header")
  }

  test("MP4 box walk reads hand-built ISO 14496-12 bytes (independent of the synthesizer)") {
    import spark.implicits._
    import java.nio.ByteBuffer
    // Build the box tree with ByteBuffer straight from the spec —
    // ftyp, then free (the walk must skip unknown siblings), then
    // moov containing iods BEFORE mvhd (the child walk must skip it
    // too). Nothing here shares code with Multimodal.mp4Payload.
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhdBody = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)          // version 0 + flags
      b.putInt(0).putInt(0)
      b.putInt(90000)      // timescale
      b.putInt(123000)     // duration ticks
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.array()            // rest (matrix etc.) stays zero — walk ignores it
    }
    val iods = box("iods", Array[Byte](0, 0, 0, 0))
    val moov = box("moov", iods ++ box("mvhd", mvhdBody))
    val bytes = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
      box("free", new Array[Byte](16)) ++ moov
    val row = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.mp4Valid(col("p")),
        Multimodal.mp4Timescale(col("p")), Multimodal.mp4Duration(col("p")),
        Multimodal.mp4DurationMs(col("p")),
        Multimodal.mp4Valid(col("p").substr(lit(9), lit(1 << 20))).as("noftyp"))
      .head()
    assert(row.getBoolean(0), "valid MP4")
    assert(row.getLong(1) === 90000L)
    assert(row.getLong(2) === 123000L)
    assert(row.getLong(3) === 123000L * 1000L / 90000L)
    assert(!row.getBoolean(4), "stripping ftyp must invalidate")
  }

  test("synthesized MP4 round-trips; version-1 mvhd and non-MP4 bytes parse to null") {
    import spark.implicits._
    val row = Seq((48000L, 96000L, "opaque samples")).toDF("ts", "dur", "body")
      .select(Multimodal.mp4Payload(col("ts"), col("dur"),
        encode(col("body"), "UTF-8")).as("p"))
      .select(Multimodal.mp4Timescale(col("p")), Multimodal.mp4Duration(col("p")),
        Multimodal.mp4DurationMs(col("p")),
        // flip the mvhd version byte (moov at 21, mvhd header 8 in,
        // version byte right after: offset 36 0-indexed → pos 37)
        Multimodal.mp4Timescale(concat(substring(col("p"), 1, 36),
          unhex(lit("01")), substring(col("p"), 38, 1 << 20))).as("v1"),
        Multimodal.mp4Timescale(encode(lit("not a container"), "UTF-8")).as("junk"))
      .head()
    assert(row.getLong(0) === 48000L)
    assert(row.getLong(1) === 96000L)
    assert(row.getLong(2) === 2000L)
    assert(row.isNullAt(3), "version-1 mvhd is out of scope and must null")
    assert(row.isNullAt(4), "junk bytes must null")
  }
}

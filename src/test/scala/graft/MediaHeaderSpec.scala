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
}

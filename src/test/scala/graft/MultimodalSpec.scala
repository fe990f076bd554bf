package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  private lazy val docs = graft.sources.Tables(spark, sf0001).table("documents").limit(50)

  test("decodeOne: real JDK codecs — two-tone PNG means, stereo WAV, graceful failures") {
    import java.awt.image.BufferedImage
    // 4x2 image: left half black, right half white → means exactly 127.5
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val di = Multimodal.decodeOne(1L, bos.toByteArray)
    assert(di.ok && di.kind === "image" && di.width === 4 && di.height === 2)
    assert(di.m0 === 127.5 && di.m1 === 127.5 && di.m2 === 127.5)

    // stereo 16-bit WAV: L channel constant +100, R constant -100.
    // The stats DEINTERLEAVE per channel: each channel is constant, so
    // zero-crossings = 0 (the interleaved stream alternates sign every
    // sample, and counting across the channel boundary used to report
    // a constant signal as maximally oscillating); meanAbs 100.
    val n = 10
    val pcm = new Array[Byte](n * 2 * 2)
    for (j <- 0 until n; c <- 0 until 2) {
      val v = if (c == 0) 100 else -100
      val off = (j * 2 + c) * 2
      pcm(off) = (v & 0xff).toByte; pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val wbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wbos)
    val da = Multimodal.decodeOne(2L, wbos.toByteArray)
    assert(da.ok && da.kind === "audio" && da.channels === 2)
    assert(da.m0 === 8000.0 && da.m1 === 100.0 && da.m2 === 0.0)

    // a genuinely oscillating mono signal still counts its crossings
    val osc = new Array[Byte](n * 2)
    for (j <- 0 until n) {
      val v = if (j % 2 == 0) 100 else -100
      osc(2 * j) = (v & 0xff).toByte; osc(2 * j + 1) = ((v >> 8) & 0xff).toByte
    }
    val mfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val mais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(osc), mfmt, n.toLong)
    val mbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(mais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, mbos)
    val dm = Multimodal.decodeOne(5L, mbos.toByteArray)
    assert(dm.ok && dm.kind === "audio" && dm.m2 === (n - 1).toDouble)

    // truncated PNG and plain text both land in unsupported, no throw
    val trunc = Multimodal.decodeOne(3L, bos.toByteArray.take(20))
    assert(!trunc.ok && trunc.kind === "unsupported")
    val text = Multimodal.decodeOne(4L, "hello world".getBytes)
    assert(!text.ok && text.kind === "unsupported")
  }

  test("media table: binary payload with typed metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("modality").dataType.typeName === "string")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction via mapPartitions is deterministic and partition-independent") {
    val media = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    val b = Multimodal.extractFeatures(spark, media.repartition(7)).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stub decode produces fixed-width features tied to payload bytes") {
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f3 = Multimodal.decodeStub("different!!".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 8)
    assert(f1.toSeq !== f3.toSeq)
  }

  test("metadata-only query does not require decoding payloads") {
    val media = Multimodal.mediaFromDocuments(docs)
    val n = media.filter(col("modality") === "audio")
      .agg(sum(octet_length(col("payload")))).head().getLong(0)
    assert(n > 0)
  }

  test("imageHashes: brightness-shift invariant, lossless-reencode stable, content-divergent") {
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val grad = Multimodal.imageHashOne(1, png(32, 24)((x, y) => x * 7 + y % 3))
    // uniform brightness shift: the aHash threshold shifts WITH the
    // mean and dHash compares are order-preserved ⇒ exact equality
    val shifted = Multimodal.imageHashOne(2, png(32, 24)((x, y) => x * 7 + y % 3 + 8))
    assert(grad.ok && shifted.ok)
    assert(shifted.ahash === grad.ahash && shifted.dhash === grad.dhash)
    // lossless re-encode (same pixels, fresh PNG) is bit-identical
    val again = Multimodal.imageHashOne(3, png(32, 24)((x, y) => x * 7 + y % 3))
    assert(again.ahash === grad.ahash && again.dhash === grad.dhash)
    // genuinely different content lands far away in Hamming space
    val other = Multimodal.imageHashOne(4, png(32, 24)((x, y) => ((x / 8 + y / 8) % 2) * 255))
    assert(hamming(grad.dhash, other.dhash) > 16,
      s"dhash distance ${hamming(grad.dhash, other.dhash)}")
    // garbage payloads take the ok=false path with zero hashes
    val bad = Multimodal.imageHashOne(5, Array[Byte](1, 2, 3))
    assert(!bad.ok && bad.ahash === 0L && bad.dhash === 0L)
  }
}

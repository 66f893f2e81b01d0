package graft

import graft.multimodal.{MediaAsset, Multimodal}
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload metadata, partition-parallel stub
  * decode, deterministic frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val assets = Seq(
    MediaAsset(1L, "image", "hello world, this is payload one!".getBytes, "s1"),
    MediaAsset(2L, "audio", Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9), "s1"),
    MediaAsset(3L, "video", Array.emptyByteArray, "s2"))

  test("decodeAll: one features row per asset, deterministic fake decode") {
    implicit val enc = Encoders.product[MediaAsset]
    val ds = spark.createDataset(assets)(enc)
    val out = Multimodal.decodeAll(ds).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).byte_len === 33L)
    assert(out(1L).n_channels === 3)       // image
    assert(out(2L).n_channels === 1)       // audio
    assert(out(2L).mean_intensity === 4.5) // mean of 0..9
    assert(out(3L).byte_len === 0L)
    assert(out(3L).mean_intensity === 0.0)
    // fake dims are pure functions of length
    assert(out(2L).width === 11 && out(2L).height === 11)
  }

  test("decodeAll: a REAL PNG/BMP payload decodes through ImageIO — " +
      "true dimensions, bands and mean sample value; garbage falls back") {
    import java.awt.image.BufferedImage
    def encode(fmt: String, img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // 4x2 RGB, left half pure red, right half pure blue:
    // mean over bands = (255 + 0 + 0 + 0 + 0 + 255) / 6 ... per pixel
    // pair -> overall mean = 255/3 = 85.0 exactly
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val png = MediaAsset(10L, "image", encode("png", img), "s")
    val bmp = MediaAsset(11L, "image", encode("bmp", img), "s")
    // valid PNG bytes under a non-image kind must NOT decode (honest
    // stub for kinds whose codecs this container lacks)
    val wrongKind = MediaAsset(12L, "video", png.payload, "s")
    val garbage = MediaAsset(13L, "image", "BMnot really a bitmap".getBytes, "s")
    implicit val enc = Encoders.product[MediaAsset]
    val out = Multimodal.decodeAll(
      spark.createDataset(Seq(png, bmp, wrongKind, garbage))(enc))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(10L, 11L)) {
      assert(out(id).width === 4 && out(id).height === 2, s"asset $id dims")
      assert(out(id).n_channels === 3)
      assert(math.abs(out(id).mean_intensity - 85.0) < 1e-9,
        s"asset $id mean ${out(id).mean_intensity}")
    }
    assert(png.payload.length !== bmp.payload.length) // two real codecs
    assert(out(12L) === Multimodal.decodeStub(wrongKind))
    assert(out(13L) === Multimodal.decodeStub(garbage))
    // the magic gate itself: text starting with "BM" is not a BMP
    // (size field mismatch), a real BMP is
    assert(!Multimodal.looksLikeImage(garbage.payload))
    assert(Multimodal.looksLikeImage(bmp.payload))
    assert(Multimodal.looksLikeImage(png.payload))
  }

  test("resizeAll shrinks payloads by area ratio; expression twin agrees") {
    implicit val enc = Encoders.product[MediaAsset]
    val ds = spark.createDataset(assets)(enc)
    // 256x192 target = 49152/307200 of VGA -> keep ceil(len * 0.16) bytes
    val out = Multimodal.resizeAll(ds, 256, 192).collect()
      .map(a => a.media_id -> a.payload).toMap
    assert(out(1L).length === math.ceil(33 * 49152 / 307200.0).toInt)
    assert(out(1L).toSeq === assets.head.payload.take(out(1L).length).toSeq)
    assert(out(3L).length === 0)
    // the DataFrame expression twin reports the same byte budget
    val meta = spark.createDataset(assets)(enc).toDF()
      .select(col("media_id") +: Multimodal.resizedMeta(col("payload"), 256, 192): _*)
      .select("media_id", "out_len").as[(Long, Long)].collect().toMap
    assert(meta(1L) === out(1L).length.toLong)
    assert(meta(2L) === out(2L).length.toLong)
  }

  test("payloadMeta: byte length + digests as pure expressions") {
    implicit val enc = Encoders.product[MediaAsset]
    val df = spark.createDataset(assets)(enc)
      .select(col("media_id") +: Multimodal.payloadMeta(col("payload")): _*)
    val r = df.filter(col("media_id") === 1).head()
    assert(r.getInt(1) === 33)
    assert(r.getString(2).length === 64) // sha256 hex
    assert(r.getString(3).length === 32) // md5 hex
  }

  test("frameNearDupPairs: a single-byte edit keeps >= 7 of 8 frames " +
      "and pairs; unrelated payloads don't; the cut is exact on the " +
      "match count") {
    val base = ("x" * 320).getBytes
    val edited = base.clone(); edited(200) = 'y' // inside frame 5's window
    val shifted = ("y" + "x" * 319).getBytes     // frame 0 differs only
    val other = ("z" * 320).getBytes
    val media = Seq(
      (1L, base), (2L, edited), (3L, shifted), (4L, other))
      .toDF("media_id", "payload")
    val pairs = Multimodal.frameNearDupPairs(media, "payload",
      "media_id", nFrames = 8, frameLen = 16, minMatches = 6)
      .select("id_a", "id_b", "matches")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // stride = 40: frame k covers bytes [40k+1, 40k+16]; byte 201 is
    // inside frame 5's window -> 7/8; byte 1 is frame 0's -> 7/8;
    // edited vs shifted differ in both -> 6/8 — all pair; `other`
    // shares nothing
    assert(pairs((1L, 2L)) === 7L)
    assert(pairs((1L, 3L)) === 7L)
    assert(pairs((2L, 3L)) === 6L)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // the cut is exact: at minMatches = 8 only identical frame sets
    // survive
    val strict = Multimodal.frameNearDupPairs(media, "payload",
      "media_id", nFrames = 8, frameLen = 16, minMatches = 8)
      .count()
    assert(strict === 0L)
  }

  test("sampleFrames: 8 deterministic frames, empty payload skipped") {
    implicit val enc = Encoders.product[MediaAsset]
    val df = spark.createDataset(assets)(enc).toDF()
    val frames = Multimodal.sampleFrames(df, "payload", "media_id", 8, 4)
    val byId = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byId(1L) === 8L)   // 33 bytes, 8 frames
    assert(byId(2L) === 8L)   // 10 bytes, stride 1
    assert(!byId.contains(3L)) // empty payload
    // determinism: same input => same digests
    val again = Multimodal.sampleFrames(df, "payload", "media_id", 8, 4)
    assert(frames.collect().toSeq === again.collect().toSeq)
  }
}

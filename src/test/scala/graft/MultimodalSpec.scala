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

package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing exercised on the driver tables: the
 * `documents.text` bytes stand in for an opaque media payload (the real
 * decode is stubbed — see Multimodal.decodeStub). Oracles hash the same
 * bytes in DuckDB (ASCII corpus ⇒ char slicing == byte slicing).
 */
object QueriesMultimodal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ binary metadata
    QueryDef("mm_payload_meta", Some("""
      SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
             sha256(text) AS sha256, md5(text) AS payload_md5
      FROM documents"""),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +:
          Multimodal.payloadMeta(col("text").cast("binary")): _*)),

    // ------------------------------------------------ frame sampling
    QueryDef("mm_frame_sample", Some("""
      SELECT d.doc_id, CAST(i AS INTEGER) AS frame_idx,
             md5(substr(d.text, CAST(i * greatest(len(d.text) // 8, 1) + 1 AS INTEGER), 16)) AS frame_md5
      FROM documents d, range(0, 8) r(i)
      WHERE len(d.text) >= 1 AND i <= len(d.text) - 1"""),
      (s, dir) => Multimodal.sampleFrames(
        t(s, dir, "documents").withColumn("payload", col("text").cast("binary")),
        "payload", "doc_id", nFrames = 8, frameLen = 16)),

    // ------------------------------------------------ stubbed resize
    // resizedMeta's byte-budget contract (len scaled by target/VGA area,
    // then truncate) is a pure expression both engines evaluate exactly:
    // integer byte counts, md5 over the prefix.
    QueryDef("mm_resize", Some("""
      SELECT doc_id,
             least(CAST(len(text) AS BIGINT),
                   CAST(ceil(CAST(len(text) AS BIGINT) * 49152 / 307200.0) AS BIGINT)) AS out_len,
             md5(substr(text, 1, CAST(least(CAST(len(text) AS BIGINT),
                   CAST(ceil(CAST(len(text) AS BIGINT) * 49152 / 307200.0) AS BIGINT)) AS INTEGER))) AS out_md5
      FROM documents"""),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id") +:
          Multimodal.resizedMeta(col("text").cast("binary"), 256, 192): _*)),

    // ------------------------------------------------ stubbed decode
    // decodeStub's fake features are deterministic functions of the bytes,
    // reproducible in SQL: byte_len, fake dims, mean byte value.
    QueryDef("mm_decode_features", Some("""
      SELECT doc_id AS media_id,
             octet_length(CAST(text AS BLOB)) AS byte_len,
             CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
             CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS INTEGER) AS height,
             CASE WHEN octet_length(CAST(text AS BLOB)) > 0
                  THEN list_sum(list_transform(range(1, octet_length(CAST(text AS BLOB)) + 1),
                                i -> ord(substr(text, CAST(i AS INTEGER), 1))))
                       / CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE)
                  ELSE 0.0 END AS mean_intensity
      FROM documents"""),
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        implicit val enc = Encoders.product[graft.multimodal.MediaAsset]
        val assets = t(s, dir, "documents")
          .select(col("doc_id").as("media_id"), lit("image").as("kind"),
            col("text").cast("binary").as("payload"), col("source"))
          .as[graft.multimodal.MediaAsset](enc)
        Multimodal.decodeAll(assets)
          .select("media_id", "byte_len", "width", "height", "mean_intensity")
      })
  )
}

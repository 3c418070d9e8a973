package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing (stubbed decode, real Spark shapes). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.asMediaTable(
    graft.catalog.Q.t(spark, "/root/testdata/sf0.001", "documents"),
    "doc_id", col("text"), "video").cache()

  test("media table matches the canonical schema") {
    // compare names + types; nullability flags differ between literal-built
    // and declared schemas and carry no contract weight here
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    assert(media.count() == 500)
    assert(media.filter(col("meta.n_bytes") <= 0).count() == 0)
  }

  test("fake decode produces the decoded-metadata contract") {
    val dec = media.select(col("asset_id"), Multimodal.fakeDecode(col("content")).as("d"))
      .select(col("asset_id"), col("d.*"))
    assert(dec.schema.fieldNames.toSeq == Seq("asset_id", "width", "height", "n_frames", "header_hex"))
    val r = dec.orderBy("asset_id").limit(1).collect()(0)
    assert(r.getInt(1) >= 64 && r.getInt(1) < 64 + 513)
    assert(r.getString(4).nonEmpty)
  }

  test("fake decode accepts a derived/aliased payload column") {
    // decode a TRANSFORMED payload (first 32 bytes, aliased) — the decoder
    // must work on any Column expression, not just a named table column
    val dec = media.select(col("asset_id"),
      Multimodal.fakeDecode(substring(col("content"), 1, 32).as("clip")).as("d"))
    val full = media.select(col("asset_id"),
      Multimodal.fakeDecode(col("content")).as("d"))
    // header is within the clip, so the fingerprint must agree with the
    // full-payload decode for every asset
    val joined = dec.select(col("asset_id"), col("d.header_hex").as("clip_hdr"))
      .join(full.select(col("asset_id"), col("d.header_hex").as("full_hdr")), "asset_id")
    assert(joined.filter(col("clip_hdr") =!= col("full_hdr")).count() == 0)
  }

  test("frame sampling cuts payload into every-k-th fixed-size chunks") {
    val frames = Multimodal.sampleFrames(media.limit(10), frameBytes = 100, everyK = 2)
    val r = frames.groupBy("asset_id").count().collect()
    assert(r.nonEmpty)
    // every kept frame index is even
    assert(frames.filter(col("frame_no") % 2 =!= 0).count() == 0)
    // frames are at most frameBytes long
    assert(frames.filter(octet_length(col("frame_bytes")) > 100).count() == 0)
  }

  test("byte-histogram features: one row per asset, dims columns, counts sum to sample size") {
    val feats = Multimodal.byteHistogramFeatures(media.limit(20), dims = 8)
    assert(feats.count() == 20)
    assert(feats.columns.length == 9) // asset_id + 8 buckets
  }

  test("parseImageDims reads real PNG/GIF/BMP headers byte-for-byte") {
    import spark.implicits._
    // Hand-built headers with KNOWN dimensions, byte orders per spec:
    // PNG 640x480 (big-endian u32), GIF 320x200 (little-endian u16),
    // BMP 1024x768 (little-endian i32), plus a JPEG magic we don't
    // parse (must yield 'unknown', not an error).
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = bytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0") // 640, 480
    val gif = "GIF89a".getBytes("US-ASCII") ++ bytes("4001" + "C800") // 320, 200
    val bmp = "BM".getBytes("US-ASCII") ++ bytes("00" * 16) ++
      bytes("00040000" + "00030000") // 1024, 768 little-endian
    val jpg = bytes("FFD8FFE0")
    val df = Seq(("png", png), ("gif", gif), ("bmp", bmp), ("jpg", jpg))
      .toDF("id", "img")
    val parsed = Multimodal.withImageDims(df, "img")
      .select("id", "fmt", "width", "height").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(parsed("png") == (("png", Some(640), Some(480))))
    assert(parsed("gif") == (("gif", Some(320), Some(200))))
    assert(parsed("bmp") == (("bmp", Some(1024), Some(768))))
    assert(parsed("jpg") == (("unknown", None, None)))
  }
}

package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The multimodal binary-column plumbing (Q34 extension): schema, batched
  * decode, frame sampling — with the deterministic stub codec.
  */
class MultimodalSpec extends SparkSpec {

  test("payload attach produces binary column + prunable metadata") {
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val f = assets.schema("payload")
    assert(f.dataType.typeName == "binary")
    // metadata filter must not require reading payload bytes
    val n = assets.filter(col("n_bytes") > 100).select("doc_id").count()
    assert(n > 0)
  }

  test("batched decode is deterministic and preserves row count") {
    import spark.implicits._
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet")).as[Multimodal.Asset]
    val decoded = Multimodal.decodeAll(assets).cache()
    assert(decoded.count() == assets.count())
    val d0 = decoded.filter(_.doc_id == 0).head()
    val d0again = Multimodal.decodeAll(assets).filter(_.doc_id == 0).head()
    assert(d0.width == d0again.width && d0.height == d0again.height)
    assert(d0.features.toSeq == d0again.features.toSeq)
    assert(d0.features.length == 16)
    decoded.unpersist()
  }

  test("frame sampling of an empty payload yields an empty frame array") {
    import spark.implicits._
    val assets = Seq((99L, "media/none", 0L, Array.empty[Byte]))
      .toDF("doc_id", "mime", "n_bytes", "payload")
    val row = Multimodal.sampleFrames(assets).select("frames").head()
    assert(row.getSeq[Array[Byte]](0).isEmpty)
  }

  test("frame sampling emits bounded fixed-size binary frames") {
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val framed = Multimodal.sampleFrames(assets, frameBytes = 8, maxFrames = 4)
    val row = framed.filter(col("doc_id") === 0).select("frames").head()
    val frames = row.getSeq[Array[Byte]](0)
    assert(frames.nonEmpty && frames.size <= 5)
    assert(frames.forall(_.length <= 8))
  }
}

package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def catalog = Multimodal.mediaCatalog(
    GraftSession.table(spark, Sf0001, "documents"))

  test("catalog: payload is binary, metadata typed, no payload needed for metadata query") {
    val c = catalog
    assert(c.schema("payload").dataType.typeName == "binary")
    val meta = c.select("media_id", "kind", "meta.n_bytes")
    assert(meta.count() == 500)
    // metadata-only read must not scan the payload column
    val plan = meta.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload") || meta.columns.forall(_ != "payload"))
  }

  test("typed decode pipeline agrees with the expression twin") {
    val viaExpr = Multimodal.extractFeatures(catalog)
      .select("media_id", "f0", "f1", "f2", "f3")
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(i => r.getDouble(i + 1)).toVector).toMap
    val viaTyped = Multimodal.decodePipeline(catalog)
      .collect().map(d => d.media_id -> d.features.toVector).toMap
    assert(viaExpr.keySet == viaTyped.keySet)
    viaExpr.foreach { case (id, fe) =>
      val ft = viaTyped(id)
      fe.zip(ft).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"media $id: $a vs $b")
      }
    }
  }

  test("decode pipeline checksum matches md5 of payload") {
    val d = Multimodal.decodePipeline(catalog).head()
    assert(d.checksum.matches("[0-9a-f]{32}"))
    assert(d.features.length == Multimodal.StubCodec.FeatureDim)
    assert(d.features.forall(f => f >= 0f && f < 1f))
  }

  test("frame sampling: 4 frames per video payload, stable checksums") {
    val f = Multimodal.frameSample(catalog)
    val perMedia = f.groupBy("media_id").count().collect()
    assert(perMedia.nonEmpty && perMedia.forall(_.getLong(1) == 4))
    // deterministic: two runs identical
    val a = f.collect().map(_.toSeq).toSet
    val b = Multimodal.frameSample(catalog).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("resize stub: target dims exact, byte budget scales with area") {
    val r = Multimodal.resizeStub(catalog, 64, 64)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x.getInt(1) == 64 && x.getInt(2) == 64))
    assert(rows.forall(_.getLong(3) >= 1))
  }
}

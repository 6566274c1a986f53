package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def writeMedia(): String = {
    val dir = tmpDir("media")
    Files.write(Paths.get(dir, "a.bin"), Array.tabulate[Byte](1000)(i => (i % 251).toByte))
    Files.write(Paths.get(dir, "b.bin"), Array.tabulate[Byte](500)(i => (i % 7).toByte))
    dir
  }

  test("readBinaryDir: binary file source → media schema") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    assert(df.count() === 2)
    assert(df.columns.toSeq === Seq("media_id", "path", "modality", "content", "meta"))
    val sizes = df.selectExpr("length(content)").collect().map(_.getInt(0)).sorted
    assert(sizes.toSeq === Seq(500, 1000))
  }

  test("extractFeatures: per-partition batch decode stub is deterministic") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val f1 = Multimodal.extractFeatures(df, dim = 16)
      .selectExpr("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(df, dim = 16)
      .selectExpr("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 16))
    assert(f1.keys.exists(_.endsWith("a.bin")))
  }

  test("features flow into ANN ops (plumbing compatibility)") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val feats = Multimodal.extractFeatures(df, dim = 8)
      .selectExpr("media_id as vec_id", "features as embedding")
    val pairs = Ann.cosineNearDupPairs(feats, "vec_id", "embedding", threshold = -1.0)
    assert(pairs.count() === 1) // one pair from two media files
  }

  test("resizeStub truncates content and stamps meta") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val out = Multimodal.resizeStub(df, targetBytes = 100, w = 10, h = 10)
    val r = out.selectExpr("length(content)", "meta.width").collect()
    assert(r.forall(_.getInt(0) === 100))
    assert(r.forall(_.getInt(1) === 10))
  }

  test("frameSampleStub emits n frames per row") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "video")
    val out = Multimodal.frameSampleStub(df, n = 4, frameBytes = 32)
    assert(out.selectExpr("size(frames)").collect().forall(_.getInt(0) === 4))
  }
}

package graft.llm

import graft.SparkSpec
import graft.queries.Tables

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payloads round-trip through batched feature extraction") {
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(Multimodal.asMedia(docs), 4)).collect()
    assert(feats.length === docs.count())
    assert(feats.forall(f => f.byte_len > 0 && f.content_md5.length === 32))
    // deterministic across partitionings
    val feats1 = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(Multimodal.asMedia(docs), 2))
      .collect().sortBy(_.doc_id).toSeq
    assert(feats.sortBy(_.doc_id).toSeq === feats1)
  }

  test("frame sampling covers every stride-th chunk exactly once") {
    val sampled = Multimodal.sampleFrames(Multimodal.asMedia(
      Tables.documents(spark, sf).limit(10)), frameBytes = 100, stride = 3)
      .collect()
    assert(sampled.nonEmpty)
    assert(sampled.forall(_.getLong(2) <= 100))
    assert(sampled.map(_.getInt(1)).forall(_ % 3 === 0))
  }
}

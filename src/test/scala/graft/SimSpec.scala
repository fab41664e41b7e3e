package graft

import org.apache.spark.sql.functions._
import graft.sim.Embeddings
import graft.multimodal.Multimodal

class SimSpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 1),
    (4L, Array(-1.0f, 0.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by cosine with id tiebreak, excludes self") {
    val got = Embeddings.bruteForceTopK(
      vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 4L)) // cos: .994, 0, -1
  }

  test("quantized dot/norm are exact integers") {
    val r = vecs.filter($"vec_id" === 1)
      .select(Embeddings.qdot(Embeddings.quantize($"embedding"),
        Embeddings.quantize($"embedding"))).first()
    assert(r.getLong(0) == 1000000L * 1000000L)
  }

  test("signBucket groups same-orthant vectors, splits opposite signs") {
    val b = vecs.select($"vec_id", Embeddings.signBucket($"embedding", 3).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1) == b(2)) // same signs in first 3 dims
    assert(b(1) != b(4)) // dim-0 sign flip
  }

  test("centroidAssign assigns tight clusters to their own centroid") {
    val clustered = Seq(
      (1L, Array.fill(64)(0.5f), 0), (2L, Array.fill(64)(0.51f), 0),
      (3L, Array.fill(64)(-0.5f), 1), (4L, Array.fill(64)(-0.52f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.centroidAssign(clustered, "vec_id", "embedding", "label")
    assert(got.agg(sum("is_match")).first().getLong(0) == 4L)
  }

  test("multimodal extractMeta: batch decode plumbing with stubbed codec") {
    val media = Multimodal.fromDocuments(spark,
      Seq((10L, "hello world"), (11L, "")).toDF("doc_id", "text"))
    val metas = Multimodal.extractMeta(media).collect().map(m => m.id -> m).toMap
    assert(metas(10).n_bytes == 11L)
    assert(metas(10).checksum == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(Set("jpeg", "png", "webp").contains(metas(10).format))
    assert(metas(10).width >= 64 && metas(10).height >= 64)
    assert(metas(11).n_bytes == 0L) // empty payload doesn't crash the decoder
  }

  test("frameSampleIndices: even spacing, cap, and zero-duration guard") {
    val df = Seq((1L, 10000.0), (2L, 0.0)).toDF("id", "dur_ms")
    val got = df.select($"id",
      Multimodal.frameSampleIndices($"dur_ms", fps = 2.0, maxFrames = 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1).length == 4)
    assert(got(1) == Seq(0, 5, 10, 15)) // 20 frames sampled at 4 evenly
    assert(got(2).isEmpty)
  }
}

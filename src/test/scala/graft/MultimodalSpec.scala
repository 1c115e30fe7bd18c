package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaBlob, StubDecoder}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stub decoder is deterministic and in-range") {
    val b = MediaBlob(7L, "hello world".getBytes("UTF-8"))
    val m1 = StubDecoder.decode(b)
    val m2 = StubDecoder.decode(MediaBlob(7L, "hello world".getBytes("UTF-8")))
    assert(m1 == m2)
    assert(m1.n_bytes == 11)
    assert(m1.width >= 64 && m1.width < 512)
    assert(m1.height >= 64 && m1.height < 512)
    assert(math.max(m1.resized_w, m1.resized_h) == 224,
      "resize scales the long side to exactly 224")
    assert(m1.resized_w <= 224 && m1.resized_h <= 224)
    assert(m1.n_frames >= 1 && m1.n_frames <= 30)
    assert(m1.f0 >= -1.0 && m1.f0 <= 1.0 && m1.f1 >= -1.0 && m1.f1 <= 1.0)
  }

  test("frame sampling: stride-4 indices, one decode per payload") {
    val frames = Multimodal.sampleFrames(Multimodal.blobs(spark, sf)).collect()
    val metas = Multimodal.decodeAll(Multimodal.blobs(spark, sf)).collect()
      .map(m => m.doc_id -> m.n_frames).toMap
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.keySet == metas.keySet)
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until metas(id) by 4).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq == expected)
      assert(fs.map(_.frame_hash).distinct.length == fs.length,
        "frame hashes must differ per index")
    }
  }

  test("decodeAll streams partitions and matches per-row decode") {
    val blobs = Multimodal.blobs(spark, sf)
    val viaSpark = Multimodal.decodeAll(blobs).collect().map(m => m.doc_id -> m).toMap
    val direct = blobs.collect().map(b => b.doc_id -> StubDecoder.decode(b)).toMap
    assert(viaSpark.size == 500 && viaSpark == direct)
  }

  test("payload bytes are the exact UTF-8 of the text column") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    Multimodal.blobs(spark, sf).collect().foreach { b =>
      assert(java.util.Arrays.equals(b.content, docs(b.doc_id).getBytes("UTF-8")))
    }
  }

  test("null text becomes an empty payload, quarantined not crashed") {
    val dir = java.nio.file.Files.createTempDirectory("nulltext").toString
    spark.sql("SELECT 1L AS doc_id, CAST(NULL AS STRING) AS text, " +
        "'en' AS lang, 'web' AS source, 0L AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val st = Multimodal.decodeStatus(Multimodal.blobs(spark, dir)).collect()
    assert(st.length == 1 && !st.head.ok && st.head.reason == "empty_payload")
  }

  test("fail-safe decode: quarantine matches the deterministic failure rule") {
    val blobs = Multimodal.blobs(spark, sf)
    val st = Multimodal.decodeStatus(blobs).collect().map(s => s.doc_id -> s).toMap
    val direct = blobs.collect()
    assert(st.size == direct.length)
    direct.foreach { b =>
      val s = st(b.doc_id)
      if (b.content.isEmpty)
        assert(!s.ok && s.reason == "empty_payload")
      else if (StubDecoder.h48(b.content) % 17 == 0)
        assert(!s.ok && s.reason == "corrupt_header")
      else assert(s.ok && s.reason == null)
    }
    // the rule actually fires on real data (~6%) but never dominates
    val failed = st.values.count(!_.ok)
    assert(failed > 0 && failed < st.size / 4, s"failed=$failed")
    // audit rollup ties out with the raw statuses
    val audit = Multimodal.decodeAudit(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(audit == ((st.size.toLong, failed.toLong)))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF-PQ index: probe-from-store ≡ in-memory ivfPqTopK, the
  * codes scan statically prunes to the probed clusters and carries no
  * vectors, and the model JSON round-trips exactly.
  */
class AnnIndexSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf())
  private def queries = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def tmp = Files.createTempDirectory("graft_ann").toString

  test("probe from the persisted index ≡ in-memory ivfPqTopK, bit-for-bit") {
    val dir = tmp
    AnnIndex.build(emb, dir)
    val stored = AnnIndex.probe(spark, dir, queries, emb, k = 5)
      .orderBy("q_id", "rank").collect()
    val mem = Similarity.ivfPqTopK(emb, queries, k = 5)
      .orderBy("q_id", "rank").collect()
    // Jackson doubles round-trip (shortest repr), so the loaded model is
    // the trained model and every sim is the identical IEEE value
    assert(stored.sameElements(mem))
  }

  test("model JSON round-trips centroids and codebooks exactly") {
    val dir = tmp
    val (built, v) = AnnIndex.build(emb, dir)
    val loaded = AnnIndex.loadModel(dir, v)
    assert(loaded == built)
  }

  test("versions are immutable and pinnable; probe defaults to newest") {
    val dir = tmp
    assert(AnnIndex.versions(dir).isEmpty)
    val (m1, v1) = AnnIndex.build(emb, dir, nCentroids = 8)
    val (m2, v2) = AnnIndex.build(emb, dir, nCentroids = 16)
    assert(v1 == 1 && v2 == 2 && AnnIndex.versions(dir) == Seq(1, 2))
    // the pin: v1 re-read AFTER v2 landed is the same model
    assert(AnnIndex.loadModel(dir, v1) == m1)
    assert(AnnIndex.loadModel(dir, v2) == m2)
    assert(m1.fine.length == 8 && m2.fine.length == 16)
    // pinned probes answer from their own version's artifacts; the
    // default probe answers from the newest
    val p1 = AnnIndex.probe(spark, dir, queries, emb, k = 5, version = v1)
      .orderBy("q_id", "rank").collect()
    val pLatest = AnnIndex.probe(spark, dir, queries, emb, k = 5)
      .orderBy("q_id", "rank").collect()
    val p2 = AnnIndex.probe(spark, dir, queries, emb, k = 5, version = v2)
      .orderBy("q_id", "rank").collect()
    assert(pLatest.sameElements(p2))
    assert(p1.nonEmpty && p2.nonEmpty)
  }

  test("the probe scans ONLY probed clusters' codes, and no vectors") {
    val dir = tmp
    AnnIndex.build(emb, dir, nCentroids = 16)
    val out = AnnIndex.probe(spark, dir, queries.limit(2), emb,
      k = 5, nprobe = 2)
    out.collect()
    val codeScans = physicalNodes(out).collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(dir))
        => s
    }
    assert(codeScans.nonEmpty, "expected a scan over the stored codes")
    codeScans.foreach { s =>
      // static pruning: the partition filter binds c_id to the probed set
      assert(s.partitionFilters.nonEmpty,
        s"codes scan should carry a partition filter:\n$s")
      // 2 queries × nprobe=2 probes ≤ 4 of the 16 cluster directories
      assert(s.selectedPartitions.partitionCount <= 4,
        s"probe should read ≤ 4 of 16 partitions, " +
          s"read ${s.selectedPartitions.partitionCount}")
      // codes-only: the data schema read off disk has codes+norm+id, no
      // embedding column
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("embedding"),
        s"codes scan must not read vectors, read: $read")
    }
  }

  test("build writes one directory per non-empty cluster, codes only") {
    val dir = tmp
    val (_, v) = AnnIndex.build(emb, dir, nCentroids = 8)
    val codes = spark.read.parquet(s"$dir/v$v/codes")
    assert(codes.columns.sorted.toSeq == Seq("c_id", "codes", "nrm", "vec_id"))
    // every corpus vector is indexed exactly once
    assert(codes.count() == emb.count())
    assert(codes.select("vec_id").distinct().count() == emb.count())
    // cluster ids land in [0, 8)
    val cids = codes.select("c_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf((0 until 8).toSet) && cids.nonEmpty)
  }
}

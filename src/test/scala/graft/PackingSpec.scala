package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence shaping: chunk coverage/overlap semantics and token-budget
  * pack assignment.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: full coverage with declared overlap; short doc = one chunk") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val df = Seq((1L, text), (2L, "only three tokens")).toDF("doc_id", "text")
    val chunks = Packing.chunk(df, window = 40, overlap = 10)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long, String)].collect()
    // doc 1: stride 30 → ceil(90/30)=3 chunks at starts 0,30,60
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(d1.map(_._3).toSeq == Seq(40L, 40L, 40L))
    assert(d1(0)._4.startsWith("t1 ") && d1(1)._4.startsWith("t31 ")
      && d1(2)._4.startsWith("t61 "))
    // chunk 1 repeats chunk 0's last 10 tokens (overlap)
    assert(d1(0)._4.split(" ").takeRight(10).toSeq ==
      d1(1)._4.split(" ").take(10).toSeq)
    // every source token appears in some chunk
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 100).map(i => s"t$i").toSet)
    // doc 2: shorter than a window → exactly one 3-token chunk
    assert(chunks.filter(_._1 == 2L).toSeq.map(c => (c._2, c._3)) == Seq((0, 3L)))
  }

  test("shard: total permutation — every doc once, contiguous positions") {
    val df = spark.range(5000).select(col("id").as("doc_id"))
    val out = Packing.shard(df, nShards = 8)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 5000)
    assert(out.map(_._1).toSet == (0L until 5000L).toSet)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // positions are 1..n within each shard, no gaps
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions")
    }
    // uniform-ish occupancy (md5 is uniform; 5000/8=625 ± 20%)
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.forall(n => n > 500 && n < 750), sizes.toSeq.sorted)
    // deterministic across partitioning
    val again = Packing.shard(df.repartition(11), nShards = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
  }

  test("shard: bucketed two-phase rank ≡ the naive per-shard window, " +
      "and no shard funnels through one task") {
    val df = spark.range(3000).select(col("id").as("doc_id"),
      (col("id") % 7).as("payload")) // extra column must pass through
    val out = Packing.shard(df, nShards = 4)
    val got = out.select("doc_id", "payload", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // the naive formulation the two-phase rank must be bit-identical to
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      .orderBy(col("__h").asc, col("doc_id").asc)
    val naive = df
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("shard",
        conv(substring(col("__h"), 1, 6), 16, 10).cast("long") % 4)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "payload", "shard", "pos")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(naive))
    // scale shape: the rank window is partitioned by (shard, bucket),
    // never by shard alone
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__b"),
      s"expected bucketed rank partitioning in plan:\n$plan")
  }

  test("pack: budget respected via cumulative assignment, deterministic") {
    val df = (1L to 50L).map(i => (i, "s", 100L)).toDF("doc_id", "source", "n_tokens")
    val packed = Packing.pack(df, budget = 1000, tokensCol = "n_tokens")
    // 50 docs x 100 tokens / 1000 budget => 5 packs of exactly 10 docs
    val sizes = packed.groupBy("pack_id").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes == (0L to 4L).map(_ -> 10L).toMap)
    // per-pack token sums hit the budget exactly here
    val sums = packed.groupBy("pack_id").agg(sum("n_tokens").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sums.values.forall(_ == 1000L))
    // deterministic across repartitioning
    val again = Packing.pack(df.repartition(7), budget = 1000,
      tokensCol = "n_tokens").select("doc_id", "pack_id")
      .as[(Long, Long)].collect().toSet
    assert(again == packed.select("doc_id", "pack_id")
      .as[(Long, Long)].collect().toSet)
  }

  test("streamOffsets: bucketed two-phase prefix sum matches an " +
      "independent per-source cumulative oracle; no per-source window") {
    val df = (1L to 3000L).map(i => (i, "s" + (i % 3), 1L + (i % 50)))
      .toDF("doc_id", "source", "n_tokens")
    val out = Packing.streamOffsets(df, "source", "n_tokens", "doc_id")
    val got = out.select(col("doc_id"), col("__off"))
      .as[(Long, Long)].collect().toMap
    // independent driver-side oracle: per source, walk docs in
    // (md5-hex(doc_id), doc_id) order accumulating token counts
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    df.as[(Long, String, Long)].collect().groupBy(_._2)
      .foreach { case (src, rs) =>
        var acc = 0L
        rs.sortBy(r => (md5hex(r._1.toString), r._1)).foreach { r =>
          assert(got(r._1) == acc, s"source $src doc ${r._1}")
          acc += r._3
        }
      }
    // scale shape: the doc-stream window is partitioned by
    // (source, hash bucket), never by source alone — a stratum can never
    // funnel through one task
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__b"),
      s"expected bucketed window partitioning in plan:\n$plan")
  }

  test("streamOffsets: a NULL stratum forms its own stream instead of " +
      "being dropped (window-semantics parity)") {
    val df = Seq((1L, "s", 10L), (2L, null.asInstanceOf[String], 7L),
      (3L, "s", 5L), (4L, null.asInstanceOf[String], 3L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Packing.streamOffsets(df, "source", "n_tokens", "doc_id")
      .select(col("doc_id"), col("source"), col("__off"))
      .as[(Long, Option[String], Long)].collect()
    assert(out.length == 4, "null-stratum rows must not be dropped")
    // each stream's offsets are a prefix sum of ITS OWN rows
    val nullStream = out.filter(_._2.isEmpty).map(_._3).sorted.toSeq
    val sStream = out.filter(_._2.nonEmpty).map(_._3).sorted.toSeq
    assert(nullStream.head == 0L && sStream.head == 0L)
    assert(nullStream.sum + sStream.sum ==
      (out.map(_._3).sum)) // streams are disjoint
    // and pack keeps them too
    assert(Packing.pack(df, budget = 100).count() == 4)
  }

  test("packContiguous: exact-budget sequences, docs split losslessly") {
    // uneven doc lengths so several docs straddle sequence boundaries
    val df = (1L to 40L).map(i => (i, "s", 30L + (i % 7) * 17L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Packing.packContiguous(df, budget = 128)
    val rows = out.select("doc_id", "seq_id", "tok_start", "tok_end", "seq_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    // lossless: per-doc ranges tile [0, n_tokens) contiguously
    val byDoc = rows.groupBy(_._1)
    val lens = df.as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $id does not start at 0")
      assert(sorted.last._4 == lens(id), s"doc $id does not end at its length")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"doc $id has a gap between sequences")
          assert(b._2 == a._2 + 1, s"doc $id skips a sequence id")
        case _ => ()
      }
      assert(rs.forall(r => r._5 == r._4 - r._3))
    }
    // every sequence but the stratum's last carries EXACTLY the budget
    val perSeq = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (seqId, tot) =>
      if (seqId != lastSeq) assert(tot == 128L, s"sequence $seqId not full: $tot")
      else assert(tot <= 128L)
    }
    // deterministic across repartitioning
    val again = Packing.packContiguous(df.repartition(7), budget = 128)
      .select("doc_id", "seq_id", "tok_start")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == rows.map(r => (r._1, r._2, r._3)).toSet)
  }
}

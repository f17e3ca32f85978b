package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EpochStore

/** The update-mode frontier store's retry/idempotence contract
  * ([[Queries.frontierStoreIngestBatch]]): a foreachBatch retry with
  * the same batchId must leave the store set-identical, and a later
  * batch must never re-emit a url an earlier batch already emitted or
  * the seed already saw.
  */
class FrontierStoreSpec extends SparkSpec {

  private def page(id: Long, site: Int, links: Seq[String]) = Row(
    id,
    s"http://site$site.com/p$id.html",
    "<html><body>" +
      links.map(l => s"""<a href="$l">x</a>""").mkString +
      "</body></html>")

  private val pageSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("page_url", StringType),
    StructField("html", StringType)))

  private def pagesDf(rows: Row*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), pageSchema)

  test("retry with the same batchId is idempotent; later batches " +
    "never re-emit seen or already-emitted urls") {
    val dir = Scratch.dir("graft_fstore_spec")
    val ref = EpochStore.claimNext(dir)
    // seed: /known is already fetched
    EpochStore.writeBatch(
      pagesDf(page(0, 1, Seq())).select(
        lit("http://site1.com/known").as("url")),
      ref, "seen", 0L)
    EpochStore.writeBatch(
      pagesDf().select(lit("d").as("domain"), lit("u").as("url"))
        .where(lit(false)),
      ref, "frontier", 0L)
    EpochStore.commit(ref)

    // batch 0: one page linking to /a, /known (seen) and /a again
    val b0 = pagesDf(page(1, 1, Seq("/a", "/known", "/a")))
    Queries.frontierStoreIngestBatch(spark, ref, b0, 0L)
    val after0 = EpochStore.readAll(spark, ref, "frontier")
      .select("url").collect().map(_.getString(0)).sorted
    assert(after0.toSeq == Seq("http://site1.com/a"))

    // RETRY batch 0 (foreachBatch redelivery): store set-identical
    Queries.frontierStoreIngestBatch(spark, ref, b0, 0L)
    val retry0 = EpochStore.readAll(spark, ref, "frontier")
      .select("url").collect().map(_.getString(0)).sorted
    assert(retry0.toSeq == after0.toSeq,
      "a retried batch must rewrite wholesale, not drop or double")

    // batch 1: re-links /a (already emitted) and adds /b
    val b1 = pagesDf(page(2, 1, Seq("/a", "/b")))
    Queries.frontierStoreIngestBatch(spark, ref, b1, 1L)
    val after1 = EpochStore.readAll(spark, ref, "frontier")
      .select("url").collect().map(_.getString(0)).sorted
    assert(after1.toSeq == Seq("http://site1.com/a", "http://site1.com/b"))
  }
}

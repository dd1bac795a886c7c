package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm table reads
    Tables.documents(s, dir).count()
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.io.{Catalog, IndexCompaction, Manifest}
    val idx = System.getProperty("java.io.tmpdir") + "/graft_t26_scratch"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    val (pRoot, sRoot) = (idx + "/postings", idx + "/stats")
    val cRoot = idx + "/catalog"
    def ingest(part: DataFrame, tag: String): Unit = {
      val withDl = part
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")))
      withDl.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .write.parquet(s"$idx/p_$tag")
      Manifest.commitWithStats(s, pRoot, s"$idx/p_$tag", Seq("doc_id"))
      withDl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tl"))
        .write.parquet(s"$idx/s_$tag")
      Manifest.commit(s, sRoot, s"$idx/s_$tag")
      Catalog.pinLatest(s, cRoot, Seq(pRoot, sRoot))
    }
    val docs = Tables.documents(s, dir)
    t("ingest-a")(ingest(docs.filter(col("doc_id") % 3 === 0), "a"))
    t("ingest-b")(ingest(docs.filter(col("doc_id") % 3 === 1), "b"))
    t("ingest-c")(ingest(docs.filter(col("doc_id") % 3 === 2), "c"))
    t("compact")(IndexCompaction.compact(s, pRoot, idx + "/p_compact",
      statsCols = Seq("doc_id")))
    t("compactStats")(IndexCompaction.compactStats(s, sRoot,
      idx + "/s_compact")(
      _.agg(sum(col("nd")).as("nd"), sum(col("tl")).as("tl"))))
    t("pin")(Catalog.pinLatest(s, cRoot, Seq(pRoot, sRoot)))
    val tf = t("resolve-tf")(Catalog.snapshotOf(s, cRoot, pRoot))
    val st = t("stats-agg")(Catalog.snapshotOf(s, cRoot, sRoot)
      .agg(sum(col("nd")), sum(col("tl"))).collect()(0))
    val (nDocs, totLen) = (st.getLong(0), st.getLong(1))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    t("query-collectTopTerms+rank") {
      val top = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
        .orderBy(col("c").desc, col("term")).limit(15).collect()
      val qterms = s.createDataFrame(
        top.slice(5, 15).toSeq.zipWithIndex
          .map { case (r, i) => (i.toLong / 2, r.getString(0)) })
        .toDF("qid", "term")
      graft.expressions.LongArrayOps.register(s)
      val scored = tf.join(broadcast(qterms), Seq("term"))
        .join(dft, Seq("term")).join(dl, Seq("doc_id"))
        .withColumn("fp", bm25Fp(col("tf"), col("df"), col("dl"),
          nDocs, totLen.toDouble / nDocs))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("fp")).as("score_fp"))
      graft.functions.RankFunctions
        .topKPerGroup(scored, "qid", "score_fp", "doc_id", 5, asc = false)
        .count()
    }
    s.stop()
  }
}

package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Cow.rewrite's contract now that the per-directory rewrites
  * submit CONCURRENTLY (r17): the returned replacement list keeps hit
  * order, every directory's rows pass through the transform exactly
  * once, staging names stay keyed by (prefix, baseVersion, index), and
  * sidecars carry. A concurrency bug (lost write, order swap, shared
  * mutable state) trips the row or order assertions.
  */
class CowRewriteSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("concurrent rewrite preserves hit order, rows, and sidecars") {
    import spark.implicits._
    val base = System.getProperty("java.io.tmpdir") + "/graft_cowrw"
    fsOf(base).delete(new Path(base), true)
    val nDirs = 9
    val hit = (0 until nDirs).map { i =>
      val d = s"$base/src-$i"
      (i * 100 until i * 100 + 10).map(k => (k.toLong, s"v$k"))
        .toDF("k", "v").coalesce(1).write.parquet(d)
      SkipStats.write(spark, d, Seq("k"))
      d
    }
    val out = Cow.rewrite(spark, hit, s"$base/stage", "cow", 7,
      df => df.filter(col("k") % 2 === 0))
    assert(out == (0 until nDirs).map(i => s"$base/stage/cow-v7-$i"),
      "replacements must come back in hit order with versioned names")
    out.zipWithIndex.foreach { case (d, i) =>
      val ks = spark.read.parquet(d).select("k")
        .as[Long].collect().sorted.toSeq
      assert(ks == (i * 100 until i * 100 + 10).map(_.toLong)
        .filter(_ % 2 == 0),
        s"dir $i must hold exactly its own transformed rows")
      assert(SkipStats.readAll(fsOf(d), d).isDefined,
        s"dir $i must carry its skip-stats sidecar")
    }
  }
}

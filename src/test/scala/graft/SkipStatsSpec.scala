package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SkipStats

/** Unit coverage for the skip-stats sidecar: typed bound compares,
  * null/empty handling, corruption → conservative keep, and the
  * unsupported-type refusal. The table-level pruning behavior lives in
  * `LayoutSpec`; this spec pins the sidecar format itself.
  */
class SkipStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val d = System.getProperty("java.io.tmpdir") + s"/graft_sstat_$name"
    fsOf(d).delete(new Path(d), true)
    d
  }

  test("round-trips long, double and string stats with exact bounds") {
    import spark.implicits._
    val dir = fresh("types")
    Seq((5L, 1.5, "bb"), (-3L, 2.75, "aa"), (9L, -0.5, "zz"))
      .toDF("k", "x", "s").write.parquet(dir)
    SkipStats.write(spark, dir, Seq("k", "x", "s"))
    val m = SkipStats.read(fsOf(dir), dir).get
    assert(m("k") == SkipStats.ColStats("long", Some(("-3", "9"))))
    assert(m("x") == SkipStats.ColStats("double", Some(("-0.5", "2.75"))))
    assert(m("s") == SkipStats.ColStats("string", Some(("aa", "zz"))))
  }

  test("string bounds compare lexically, not numerically") {
    import spark.implicits._
    val dir = fresh("lex")
    // lexically "10" < "9": a numeric compare would wrongly skip
    Seq("10", "30").toDF("s").write.parquet(dir)
    SkipStats.write(spark, dir, Seq("s"))
    val cs = SkipStats.read(fsOf(dir), dir).get("s")
    assert(cs.tpe == "string" && cs.bounds.contains(("10", "30")))
  }

  test("an all-null column records no bounds and a range never matches") {
    import spark.implicits._
    val dir = fresh("nulls")
    Seq(Some(1L), Some(2L)).toDF("k")
      .withColumn("n", lit(null).cast("long")).write.parquet(dir)
    SkipStats.write(spark, dir, Seq("k", "n"))
    val m = SkipStats.read(fsOf(dir), dir).get
    assert(m("n") == SkipStats.ColStats("long", None))
    assert(m("k").bounds.contains(("1", "2")))
  }

  test("a truncated sidecar reads as None — conservative keep, " +
      "never a wrong skip") {
    import spark.implicits._
    val dir = fresh("trunc")
    Seq(1L, 2L).toDF("k").write.parquet(dir)
    SkipStats.write(spark, dir, Seq("k"))
    val p = new Path(dir, SkipStats.StatsFile)
    val f = fsOf(dir)
    val full = {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = f.create(p, true)
    try out.write(full.stripSuffix("end\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(SkipStats.read(f, dir).isEmpty,
      "a sidecar without its terminator must not be trusted")
  }

  test("values needing escaping survive the sidecar encoding") {
    import spark.implicits._
    val dir = fresh("esc")
    Seq("a\tb", "z%20\nq").toDF("s").write.parquet(dir)
    SkipStats.write(spark, dir, Seq("s"))
    val cs = SkipStats.read(fsOf(dir), dir).get("s")
    assert(cs.bounds.contains(("a\tb", "z%20\nq")))
  }

  test("a malformed col line poisons the sidecar to None, not a throw") {
    import spark.implicits._
    val dir = fresh("malformed")
    Seq(1L, 2L).toDF("k").write.parquet(dir)
    SkipStats.write(spark, dir, Seq("k"))
    val p = new Path(dir, SkipStats.StatsFile)
    val f = fsOf(dir)
    val doctored = {
      val in = f.open(p)
      val s0 =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      s0.replaceFirst("(?m)^col\t.*$", "col\tk\tlong\t1\t2\textra\tfield")
    }
    val out = f.create(p, true)
    try out.write(doctored
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(SkipStats.read(f, dir).isEmpty,
      "a line with unexpected fields must degrade to conservative keep")
  }

  test("NaN double bounds degrade to conservative keep, never a crash") {
    import spark.implicits._
    val root = System.getProperty("java.io.tmpdir") + "/graft_sstat_nan"
    fsOf(root).delete(new Path(root), true)
    Seq(1.0, Double.NaN).toDF("x").write.parquet(s"$root/data/b1")
    SkipStats.write(spark, s"$root/data/b1", Seq("x"))
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    // Spark's max orders NaN above everything → mx = "NaN"; the range
    // probe must keep the dir (and return the filtered rows), not throw
    val (kept, skipped) = SkipStats.prunedDirs(spark, root, "x",
      "100", "200")
    assert(kept == Seq(s"$root/data/b1") && skipped.isEmpty)
  }

  test("an unsupported column type is rejected loudly") {
    import spark.implicits._
    val dir = fresh("badtype")
    Seq(Seq(1, 2), Seq(3)).toDF("arr").write.parquet(dir)
    intercept[IllegalArgumentException] {
      SkipStats.write(spark, dir, Seq("arr"))
    }
  }
}

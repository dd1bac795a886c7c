package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Whiten
import graft.queries.SimilarityQueries

/** End-to-end pin for the PCA/whitening split: the cluster's exact
  * moment statistics (s18, oracle-gated) drive a driver-side Jacobi
  * eigensolve and ZCA transform, and the whitened corpus must actually
  * have identity covariance — the property the transform exists for.
  */
class WhitenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("jacobi reconstructs a small symmetric matrix") {
    val m = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -0.2),
      Array(0.5, -0.2, 2.0))
    val (lam, v) = Whiten.jacobiEigen(m)
    // M == V diag(lam) V^T within float tolerance
    for (i <- 0 until 3; j <- 0 until 3) {
      val rec = (0 until 3).map(k => v(i)(k) * lam(k) * v(j)(k)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-9,
        s"reconstruction off at ($i,$j): $rec vs ${m(i)(j)}")
    }
  }

  test("s18 moments stay exact past the int64 accumulator boundary") {
    // 2^23 rows of max-magnitude (+2^20) components: every per-row
    // product is exactly 2^40, so the TRUE second moment is
    // 2^23 * 2^40 = 2^63 — one past Long.MaxValue. The old global long
    // accumulator wrapped this silently to Long.MinValue; the
    // per-block + DECIMAL(38,0) path must return it exactly.
    import org.apache.spark.sql.functions._
    val n = 1L << 23
    val comp = 1L << 20
    val df = spark.range(n).select(col("id").as("vec_id"),
      array(lit(comp), lit(comp)).as("v"))
    val rows = graft.queries.SimilarityQueries
      .pcaMomentsExact(spark, df, dim = 2, blockRows = 1L << 22)
      .collect()
    assert(rows.length == 3) // (0,0) (0,1) (1,1)
    val wantSxy = BigInt(1) << 63            // exceeds int64
    val wantSx = BigInt(comp) * BigInt(n)    // 2^43, fits
    assert(wantSxy > BigInt(Long.MaxValue))
    rows.foreach { r =>
      assert(BigInt(r.getDecimal(2).toBigInteger) == wantSxy,
        s"sxy at (${r.getInt(0)},${r.getInt(1)}): ${r.getDecimal(2)}")
      assert(BigInt(r.getDecimal(3).toBigInteger) == wantSx)
      assert(BigInt(r.getDecimal(4).toBigInteger) == wantSx)
      assert(r.getLong(5) == n)
    }
  }

  test("a moment past int64 raises loudly at the BIGINT gate " +
      "projection instead of wrapping") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1L << 23).select(col("id").as("vec_id"),
      array(lit(1L << 20), lit(1L << 20)).as("v"))
    val ex = intercept[Exception] {
      graft.queries.SimilarityQueries
        .pcaMomentsChecked(spark, df, dim = 2, blockRows = 1L << 22)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("moment exceeds int64")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")
  }

  test("whitening the embedding corpus with the s18 moments yields " +
      "identity covariance") {
    val dim = 64
    val rows = SparkEntry.queries("s18_pca_moments")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    val n = rows.head._6
    val cov = Whiten.covariance(rows, dim)
    val w = Whiten.zcaWhitener(cov, eps = 1e-6)
    // project the quantized corpus (driver-side here — the same d×d
    // matrix broadcasts to a per-row projection at scale)
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x =>
        floor(x.cast("double") * 1048576.0 + 0.5).cast("long")).as("v"))
      .collect().map(_.getSeq[Long](0).toArray)
    assert(vecs.length == n)
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum.toDouble / n)
    val proj = vecs.map { v0 =>
      val centered = Array.tabulate(dim)(i => v0(i) - mean(i))
      Array.tabulate(dim)(i =>
        (0 until dim).map(k => w(i)(k) * centered(k)).sum)
    }
    // sample covariance of the whitened corpus ≈ I
    for (i <- 0 until dim; j <- i until dim) {
      val c = proj.map(p => p(i) * p(j)).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-3,
        s"whitened covariance off at ($i,$j): $c")
    }
  }
}

package graft.functions

/** Driver-side half of PCA / ZCA whitening: turn the exact sufficient
  * statistics the cluster computed
  * ([[graft.queries.SimilarityQueries]] `s18_pca_moments` — per-dim
  * sums, upper-triangle second moments, row count) into a covariance
  * matrix, its eigendecomposition, and the ZCA whitening transform
  * W = V·diag(1/√(λ+ε))·Vᵀ. Everything here is O(d²–d³) on a d×d
  * matrix — pure driver arithmetic, by design: the only data-scale
  * work is the one-pass moment aggregation, and the transform that
  * comes out is a d×d broadcastable constant any per-row projection
  * can apply. Eigensolver is cyclic Jacobi — adequate and dependency-
  * free for the d ≤ a-few-hundred regime embedding pipelines use.
  */
object Whiten {

  /** Covariance from the `(i, j, sxy, si, sj, n)` moment rows
    * (upper triangle; i ≤ j): cov = (Σxy − ΣxΣy/n) / n.
    */
  def covariance(rows: Seq[(Int, Int, Long, Long, Long, Long)],
      dim: Int): Array[Array[Double]] = {
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, sxy, si, sj, n) =>
      val v = (sxy.toDouble - si.toDouble * sj.toDouble / n) / n
      c(i)(j) = v
      c(j)(i) = v
    }
    c
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS),
    * satisfying M ≈ V·diag(λ)·Vᵀ.
    */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < maxSweeps && offDiag(a) > 1e-18) {
      for (p <- 0 until n - 1; q <- p + 1 until n
          if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 ⇒ 45° rotation
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** ZCA whitening transform W = V·diag(1/√(max(λ,0)+ε))·Vᵀ for the
    * given covariance: applying W to centered vectors yields unit
    * covariance (identity), while staying as close as possible to the
    * original basis (the ZCA property).
    */
  def zcaWhitener(cov: Array[Array[Double]], eps: Double = 1e-9)
      : Array[Array[Double]] = {
    val n = cov.length
    val (lam, v) = jacobiEigen(cov)
    val invSqrt = lam.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    Array.tabulate(n, n) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < n) { s += v(i)(k) * invSqrt(k) * v(j)(k); k += 1 }
      s
    }
  }
}

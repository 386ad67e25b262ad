package graft.functions

/** Deterministic driver-side Lloyd's iteration for coarse-quantizer
  * fitting: a k-cell IVF quantizer is k×dim floats trained on a
  * BOUNDED sample — a driver micro-task (milliseconds on thousands of
  * points), not a distributed job. Replacing the MLlib KMeans stage
  * removes an entire ML pipeline fit (sampling already bounded the
  * input) from the query path; cell ASSIGNMENT of the full corpus
  * stays distributed through the [[NearestCells]] codegen kernel.
  *
  * Determinism: splitmix64-seeded distinct initial centers, ties to
  * the lower index, empty clusters keep their previous center — same
  * inputs, same quantizer, every run.
  */
object KMeansLite {

  def fit(points: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Float]] = {
    require(points.nonEmpty, "empty sample")
    val dim = points(0).length
    val n = points.length
    // deterministic init: k distinct indices from a splitmix stream
    val init = scala.collection.mutable.LinkedHashSet.empty[Int]
    var z = seed
    while (init.size < math.min(k, n)) {
      z = MinHashBandSigs.mix(z)
      init += java.lang.Math.floorMod(z, n.toLong).toInt
    }
    var centers = init.toArray.map(i => points(i).map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      var p = 0
      while (p < n) {
        val pt = points(p)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          var d = 0.0
          var j = 0
          while (j < dim) {
            val diff = pt(j).toDouble - centers(c)(j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += pt(j).toDouble; j += 1 }
        counts(best) += 1
        p += 1
      }
      centers = centers.indices.toArray.map { c =>
        if (counts(c) == 0L) centers(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centers.map(_.map(_.toFloat))
  }
}

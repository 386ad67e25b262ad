package graft.functions

/** Deterministic driver-side Lloyd's iteration for coarse-quantizer
  * fitting: a k-cell IVF quantizer is k×dim floats trained on a
  * BOUNDED sample — a driver micro-task (milliseconds on thousands of
  * points), not a distributed job. Replacing the MLlib KMeans stage
  * removes an entire ML pipeline fit (sampling already bounded the
  * input) from the query path; cell ASSIGNMENT of the full corpus
  * stays distributed through the [[NearestCells]] codegen kernel.
  *
  * Every arithmetic step is REPLAYABLE in portable SQL, which is what
  * lets emb_ann_ivf carry a full DuckDB oracle:
  *  - init: the first k sample points (callers pass the sample in a
  *    deterministic order, e.g. ORDER BY vec_id LIMIT n);
  *  - assignment: squared-euclidean, ascending-index double fold,
  *    ties to the lower cell index;
  *  - update: FIXED-POINT accumulation — per-point components are
  *    floored to 2^20 micro-units and summed as Long (exact,
  *    order-independent, unlike a double sum), and the new center is
  *    ONE correctly-rounded double division `sumMicro / (n · 2^20)`;
  *  - empty cells keep their previous center;
  *  - the returned matrix is rounded to FLOAT (what the NearestCells
  *    kernel consumes), IEEE round-to-nearest-even on both engines.
  */
object KMeansLite {

  final val MicroScale = 1048576.0d // 2^20

  def fit(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    require(points.nonEmpty, "empty sample")
    val dim = points(0).length
    val n = points.length
    var centers: Array[Array[Double]] =
      points.take(math.min(k, n)).map(_.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Long](dim))
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
        while (j < dim) {
          sums(best)(j) += math.floor(pt(j).toDouble * MicroScale).toLong
          j += 1
        }
        counts(best) += 1
        p += 1
      }
      centers = centers.indices.toArray.map { c =>
        if (counts(c) == 0L) centers(c)
        else sums(c).map(_.toDouble / (counts(c) * MicroScale))
      }
      it += 1
    }
    centers.map(_.map(_.toFloat))
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Optimized Product Quantization with a LEARNED dense rotation — the full
  * non-parametric OPQ of Ge et al., "Optimized Product Quantization for
  * Approximate Nearest Neighbor Search" (CVPR 2013, public): alternate
  * (a) per-subspace k-means codebook refits in the rotated space with
  * (b) an orthogonal Procrustes solve (SVD of XᵀX̂) for the rotation that
  * best aligns the data with its current quantization. Complements
  * [[Similarity.varianceSnakePerm]], the permutation-only family member:
  * the permutation is SQL-replayable and therefore oracle-checked (x84),
  * while THIS variant needs an SVD, which no oracle SQL can express — so
  * it is test-gated instead (OpqSpec asserts orthogonality, monotone
  * non-increasing training distortion, and end-to-end encode distortion
  * strictly below the seed-codebook PQ baseline).
  *
  * Scale shape: training runs on a DRIVER-SIDE SAMPLE (n·d doubles — the
  * classic OPQ regime; FAISS trains OPQ matrices on ~2^16 samples), which
  * is the same bounded-driver-state discipline as the BPE merge table or
  * k-means seed collection. Serving is one row-local matrix-vector kernel
  * per vector ([[rotate]]) followed by the ordinary PQ/IVF-PQ path — the
  * corpus itself never leaves the cluster.
  */
object Opq {

  /** Trained model: row-vector convention, y = x·R (R is d×d orthogonal);
    * `codebooks` is [k] full-length centroid vectors assembled so subspace
    * s of centroid c occupies dims [s·d/m, (s+1)·d/m) — the exact layout
    * [[Similarity.pqEncode]] consumes. `mseHistory` is the per-iteration
    * quantization MSE in the rotated space (non-increasing). */
  final case class Model(r: Array[Array[Double]],
      codebooks: Array[Array[Double]], mseHistory: Seq[Double])

  /** Train rotation + codebooks on an in-memory sample. Deterministic:
    * identity init, first-k subvector codebook seeds, strict-< nearest
    * ties to the lowest centroid index, no randomness anywhere. */
  def train(samples: Array[Array[Double]], m: Int, k: Int,
      iters: Int): Model = {
    require(samples.nonEmpty, "OPQ train: empty sample")
    val n = samples.length
    val d = samples(0).length
    require(d % m == 0, s"dim $d not divisible by m $m")
    require(k <= n, s"k $k centroids need at least k sample rows, got $n")
    val dsub = d / m
    import breeze.linalg.{svd, DenseMatrix}

    val x = DenseMatrix.tabulate(n, d)((i, j) => samples(i)(j))
    var r = DenseMatrix.eye[Double](d)
    // codebooks(s)(c) is the dsub-length centroid c of subspace s,
    // initialized from the first k rows of the (identity-) rotated sample
    val cb = Array.tabulate(m, k)((s, c) =>
      Array.tabulate(dsub)(j => samples(c)(s * dsub + j)))
    val assign = Array.ofDim[Int](m, n)
    val mseHist = scala.collection.mutable.ArrayBuffer.empty[Double]

    var it = 0
    while (it < iters) {
      val y = x * r
      // (a) Lloyd step per subspace in the current rotated space
      var s = 0
      while (s < m) {
        val off = s * dsub
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            val cent = cb(s)(c)
            var dist = 0.0; var j = 0
            while (j < dsub) {
              val diff = y(i, off + j) - cent(j); dist += diff * diff; j += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          assign(s)(i) = best
          i += 1
        }
        var c = 0
        while (c < k) {
          val sums = new Array[Double](dsub); var cnt = 0
          var i = 0
          while (i < n) {
            if (assign(s)(i) == c) {
              cnt += 1; var j = 0
              while (j < dsub) { sums(j) += y(i, off + j); j += 1 }
            }
            i += 1
          }
          if (cnt > 0) { // empty cells keep their old centroid
            var j = 0
            while (j < dsub) { cb(s)(c)(j) = sums(j) / cnt; j += 1 }
          }
          c += 1
        }
        s += 1
      }
      // reconstruction in rotated space + this iteration's distortion
      val yhat = DenseMatrix.tabulate(n, d) { (i, j) =>
        cb(j / dsub)(assign(j / dsub)(i))(j % dsub)
      }
      var sse = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < d) { val diff = y(i, j) - yhat(i, j); sse += diff * diff; j += 1 }
        i += 1
      }
      mseHist += sse / (n.toDouble * d)
      // (b) orthogonal Procrustes: min_R ||xR - yhat||_F over orthogonal R
      val s2 = svd(x.t * yhat)
      r = s2.U * s2.Vt
      it += 1
    }

    val rOut = Array.tabulate(d, d)((i, j) => r(i, j))
    val cbOut = Array.tabulate(k) { c =>
      val full = new Array[Double](d)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < dsub) { full(s * dsub + j) = cb(s)(c)(j); j += 1 }
        s += 1
      }
      full
    }
    Model(rOut, cbOut, mseHist.toSeq)
  }

  /** Row-local rotation kernel: y = x·R over a float-array column (flat
    * primitive arrays, no per-element boxing in the hot loop). Orthogonal
    * R preserves norms and cosines, so the exact re-rank tail needs no
    * change; only the PQ slicing sees the rotated basis. */
  def rotate(embCol: Column, r: Array[Array[Double]]): Column = {
    val d = r.length
    val flat = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { flat(i * d + j) = r(i)(j); j += 1 }
      i += 1
    }
    val kernel = udf { v: Seq[Float] =>
      val x = v.toArray
      val out = new Array[Float](d)
      var j = 0
      while (j < d) {
        var acc = 0.0; var i = 0
        while (i < d) { acc += x(i) * flat(i * d + j); i += 1 }
        out(j) = acc.toFloat
        j += 1
      }
      out
    }
    kernel(embCol)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed vector aggregations (`Aggregator` over `Dataset[T]` — the typed
  * API surface for custom aggregation state, SURVEY.md §2.10).
  */
object Vectors {

  /** Element-wise mean of embedding vectors — the centroid. Buffer is
    * (running sums, count); merge is associative/commutative, so Spark
    * runs it map-side partial + reduce (one shuffle of dim-sized buffers,
    * never the vectors themselves) — the shape that holds at corpus scale.
    */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val (sums, n) = b
      var i = 0
      val m = math.min(dim, v.length)
      while (i < m) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }

    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      val (sx, nx) = x; val (sy, ny) = y
      var i = 0
      while (i < dim) { sx(i) += sy(i); i += 1 }
      (sx, nx + ny)
    }

    override def finish(b: (Array[Double], Long)): Array[Double] = {
      val (sums, n) = b
      if (n == 0) sums else sums.map(_ / n)
    }

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Centroid per key over a typed Dataset of (key, vector). */
  def centroids(ds: Dataset[(Int, Array[Float])], dim: Int): Dataset[(Int, Array[Double])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new CentroidAggregator(dim).toColumn.name("centroid"))
  }

  /** Symmetric per-vector int8 quantization (the standard memory-compression
    * step for ANN indexes: 4× smaller than float32, cosine/dot rankings
    * nearly preserved). Adds `q_scale` (`127 / max|x|`, 0 for the
    * all-zero vector) and `q_vec` (`array<int>` of
    * `clamp(floor(x * q_scale + 0.5), -127, 127)`).
    *
    * All arithmetic is DOUBLE with an explicit `floor(x+0.5)` rounding rule,
    * so any engine following IEEE-754 reproduces the quantized values
    * bit-for-bit (the DuckDB oracle recomputes them exactly — no
    * round-half-even vs round-half-up ambiguity). Shuffle-free, per-row.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__maxabs",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn("q_scale",
        when(col("__maxabs") > 0, lit(127.0) / col("__maxabs")).otherwise(lit(0.0)))
      .withColumn("q_vec", transform(col(vecCol), x =>
        greatest(lit(-127), least(lit(127),
          floor(x.cast("double") * col("q_scale") + lit(0.5)).cast("int")))))
      .drop("__maxabs")
}

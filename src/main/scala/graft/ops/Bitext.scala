package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Margin-based parallel-corpus (bitext) mining over multilingual document
  * embeddings — the standard way machine-translation / multilingual
  * pretraining pipelines harvest aligned sentence/document pairs from two
  * monolingual sides (ratio-margin scoring per Artetxe & Schwenk,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings", ACL 2019).
  *
  * Raw cosine is a poor mining criterion because some embeddings are
  * "hubs" — similar to everything. The ratio margin normalizes each pair's
  * cosine by the mean of both endpoints' top-k neighborhoods:
  *
  *   margin(x, y) = cos(x, y) / ((meanTopK(x→B) + meanTopK(y→A)) / 2)
  *
  * and keeps each source's best-margin target above a threshold.
  */
object Bitext {

  /** Mine (src, tgt) candidate pairs between the `srcLang` and `tgtLang`
    * slices of a (id, lang, vec) frame.
    *
    * This is the exhaustive variant: the target slice joins in full
    * (broadcast — one language slice of a curation batch is the small
    * side; the pair frame is then |A|×|B|). At corpus scale, generate the
    * candidate pairs with the ANN family instead ([[Similarity.ivfTopK]] /
    * [[Dedup.embeddingCosinePairs]]'s banded LSH) and apply the identical
    * margin scoring over the candidate set — the formula only needs each
    * endpoint's top-k, which the ANN result already is.
    *
    * Cosines are rounded to 4dp BEFORE ranking/margins (the repo-wide
    * determinism convention — rank ties then break on id, so an external
    * recomputation orders identically).
    *
    * Returns (src_id, tgt_id, sim, margin): each source's single best
    * target by margin, where margin > `marginThreshold`.
    */
  def minePairs(
      df: DataFrame,
      idCol: String,
      langCol: String,
      vecCol: String,
      srcLang: String,
      tgtLang: String,
      k: Int = 4,
      marginThreshold: Double = 1.0): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      col(vecCol).as("vec"), vec_norm(col(vecCol)).as("nrm"))
    val a = base.filter(col("lang") === srcLang)
      .select(col("id").as("src_id"), col("vec").as("va"), col("nrm").as("na"))
    val b = base.filter(col("lang") === tgtLang)
      .select(col("id").as("tgt_id"), col("vec").as("vb"), col("nrm").as("nb"))

    // materialize the scored candidate set ONCE: the pair frame feeds
    // three consumers (pair list, source-side top-k means, target-side
    // top-k means) and without this the |A|×|B| cosine cross-join subtree
    // is re-evaluated per consumer (3× the dominant cost — seen in the
    // physical plan as three BroadcastNestedLoopJoin copies). Slim
    // (src_id, tgt_id, sim) rows only — vectors never persist.
    val pairs = a.join(broadcast(b))
      .withColumn("sim", round(vec_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .select("src_id", "tgt_id", "sim")
      .localCheckpoint()
    marginScore(pairs, k, marginThreshold)
  }

  /** The ratio-margin scorer over an already-generated candidate pair
    * frame (src_id, tgt_id, sim) — shared by the exhaustive
    * [[minePairs]] and the ANN-candidate [[minePairsAnn]]: per-endpoint
    * top-k means, the ratio margin, and each source's single best target
    * above `marginThreshold`. The per-endpoint windows partition by one
    * id, so their width is that endpoint's CANDIDATE fan-out — bounded by
    * construction on the ANN path (bands × maxBucket), |B| on the
    * exhaustive path.
    */
  private def marginScore(
      pairs: DataFrame,
      k: Int,
      marginThreshold: Double): DataFrame = {
    val rnA = row_number().over(Window.partitionBy("src_id").orderBy(col("sim").desc, col("tgt_id")))
    val mA = pairs.withColumn("rn", rnA).filter(col("rn") <= k)
      .groupBy("src_id").agg(avg("sim").as("m_a"))
    val rnB = row_number().over(Window.partitionBy("tgt_id").orderBy(col("sim").desc, col("src_id")))
    val mB = pairs.withColumn("rn", rnB).filter(col("rn") <= k)
      .groupBy("tgt_id").agg(avg("sim").as("m_b"))

    val scored = pairs
      .join(mA, Seq("src_id"))
      .join(mB, Seq("tgt_id"))
      .withColumn("margin", round(col("sim") / ((col("m_a") + col("m_b")) / 2), 4))
    val best = row_number().over(Window.partitionBy("src_id").orderBy(col("margin").desc, col("tgt_id")))
    scored.withColumn("rn", best).filter(col("rn") === 1)
      .filter(col("margin") > marginThreshold)
      .select("src_id", "tgt_id", "sim", "margin")
  }

  /** Corpus-scale [[minePairs]]: identical margin scoring, but the
    * candidate pairs come from banded random-hyperplane LSH instead of
    * the |A|×|B| cross join — each (band, bucket) yields only its
    * cross-lingual src×tgt pairs, so the pair frame is
    * Σ_buckets |src|·|tgt| with `maxBucket` capping degenerate buckets
    * (the [[Dedup.embeddingCosinePairs]] banding, applied bipartite).
    * The margin formula only needs each endpoint's top-k neighborhood,
    * which the candidate set approximates — the standard ANN relaxation
    * of Artetxe & Schwenk's scorer (their FAISS retrieval step).
    *
    * Recall caveat: a true pair hashing into no shared band is missed;
    * audit with the exhaustive form on a sample (the declared
    * `bitext_mine_ann` query carries exactly that side-by-side).
    *
    * Scale shape: the signature is a native codegen'd expression computed
    * once per row; buckets group-by-shuffle slim (band, bucket, id, lang)
    * rows; vectors re-attach by id join only for surviving candidates;
    * no cross join, no broadcast of a corpus slice.
    */
  def minePairsAnn(
      df: DataFrame,
      idCol: String,
      langCol: String,
      vecCol: String,
      srcLang: String,
      tgtLang: String,
      k: Int = 4,
      marginThreshold: Double = 1.0,
      lshPlanes: Int = 4,
      lshBands: Int = 8,
      maxBucket: Int = 10000): DataFrame = {
    require(lshPlanes >= 1 && lshBands >= 1 && lshPlanes * lshBands <= 63,
      s"need 1 <= lshPlanes*lshBands <= 63: $lshPlanes x $lshBands")
    val base = df.select(col(idCol).as("id"), col(langCol).as("lang"),
        col(vecCol).as("vec"), vec_norm(col(vecCol)).as("nrm"))
      .filter(col("lang").isin(srcLang, tgtLang))

    val mask = (1L << lshPlanes) - 1
    val bandCols = array((0 until lshBands).map { j =>
      struct(
        lit(j).as("band"),
        shiftright(col("sig"), j * lshPlanes).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
    // bipartite banding: collect each bucket's src ids and tgt ids
    // separately, emit only cross-lingual pairs (sorted lists make the
    // explode order deterministic; pair count is |src|·|tgt| per bucket)
    val candidates = base
      .withColumn("sig", graft.ops.Similarity.lshSignature(col("vec"), lshPlanes * lshBands))
      .select(col("id"), col("lang"), explode(bandCols).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .agg(
        sort_array(collect_list(when(col("lang") === srcLang, col("id")))).as("src_ids"),
        sort_array(collect_list(when(col("lang") === tgtLang, col("id")))).as("tgt_ids"))
      .filter(size(col("src_ids")) >= 1 && size(col("tgt_ids")) >= 1 &&
        (size(col("src_ids")) + size(col("tgt_ids"))) <= maxBucket)
      .select(explode(col("src_ids")).as("src_id"), col("tgt_ids"))
      .select(col("src_id"), explode(col("tgt_ids")).as("tgt_id"))
      .distinct()

    val a = base.filter(col("lang") === srcLang)
      .select(col("id").as("src_id"), col("vec").as("va"), col("nrm").as("na"))
    val b = base.filter(col("lang") === tgtLang)
      .select(col("id").as("tgt_id"), col("vec").as("vb"), col("nrm").as("nb"))
    val pairs = candidates
      .join(a, Seq("src_id"))
      .join(b, Seq("tgt_id"))
      .withColumn("sim", round(vec_dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .select("src_id", "tgt_id", "sim")
      .localCheckpoint()
    marginScore(pairs, k, marginThreshold)
  }
}

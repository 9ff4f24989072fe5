package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset co-occurrence mining (the 2-itemset core of Apriori —
  * Agrawal & Srikant, VLDB'94): which items appear together in the same
  * basket more often than chance. The support thresholds ARE the
  * operator's semantics, not a sampling shortcut: pairs are defined over
  * items that are individually frequent (`minItemSupport`), which is also
  * exactly the Apriori downward-closure argument for why the pair space
  * stays tractable — an infrequent item cannot participate in a frequent
  * pair at equal thresholds.
  *
  * Plan shape (100 TB): one distinct over (basket, item), one item-support
  * aggregate, a slim semi-join to keep frequent items, one basket-keyed
  * aggregate whose pair explosion ([[Dedup.orderedPairsOf]]) is bounded
  * by BASKET SIZE squared (baskets are small by nature — the quadratic
  * term never touches corpus size), one pair-count aggregate, and two
  * item-keyed support joins + a 1-row broadcast for lift. No cross join,
  * no driver collect. The distinct (basket, item) frame feeds three
  * subtrees and is localCheckpoint'ed — the same materialization a
  * production mining job would persist.
  */
object Basket {

  /** Pairs `(item_a < item_b)` of individually-frequent items
    * (`support(item) ≥ minItemSupport`) co-occurring in at least
    * `minPairSupport` baskets, with
    * `lift = P(ab) / (P(a)·P(b)) = support·n_baskets / (s_a·s_b)`
    * (rounded to 4; > 1 means the pair co-occurs above chance).
    * `n_baskets` counts ALL baskets, not only those containing frequent
    * items — lift is relative to the full corpus.
    */
  def frequentPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minItemSupport: Long,
      minPairSupport: Long): DataFrame =
    pairsWithStats(df, basketCol, itemCol, minItemSupport, minPairSupport)
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support") * col("__n") / (col("__sa") * col("__sb")), 4)
          .as("lift"))

  /** Directed association rules `antecedent → consequent` from the
    * frequent pairs: `confidence = support(ab) / support(antecedent)`
    * (the conditional P(b|a)), emitted in BOTH directions per pair —
    * confidence is asymmetric even though support and lift are not —
    * and filtered on the unrounded value. The two directions explode
    * from ONE pass over the pair frame, not two selects over it.
    */
  def rules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minItemSupport: Long,
      minPairSupport: Long,
      minConfidence: Double): DataFrame = {
    require(minConfidence > 0.0 && minConfidence <= 1.0,
      s"minConfidence must be in (0, 1], got $minConfidence")
    val liftCol = col("support") * col("__n") / (col("__sa") * col("__sb"))
    pairsWithStats(df, basketCol, itemCol, minItemSupport, minPairSupport)
      .select(explode(array(
        struct(col("item_a").as("ant"), col("item_b").as("cons"),
          col("support"), (col("support") / col("__sa")).as("conf"),
          liftCol.as("lift")),
        struct(col("item_b").as("ant"), col("item_a").as("cons"),
          col("support"), (col("support") / col("__sb")).as("conf"),
          liftCol.as("lift")))).as("r"))
      .filter(col("r.conf") >= minConfidence)
      .select(col("r.ant").as("antecedent"), col("r.cons").as("consequent"),
        col("r.support").as("support"),
        round(col("r.conf"), 4).as("confidence"),
        round(col("r.lift"), 4).as("lift"))
  }

  /** Frequent pairs with the raw stats the public shapes derive from:
    * per-side item supports (`__sa`/`__sb`) and the total basket count
    * (`__n`, as double).
    */
  private def pairsWithStats(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minItemSupport: Long,
      minPairSupport: Long): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1,
      s"bad minItemSupport=$minItemSupport / minPairSupport=$minPairSupport")

    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
      .localCheckpoint()

    val freq = items.groupBy("i").agg(count(lit(1)).as("s"))
      .filter(col("s") >= minItemSupport)

    val pairs = items.join(freq.select("i"), Seq("i"))
      .groupBy("b").agg(sort_array(collect_list(col("i"))).as("is"))
      .filter(size(col("is")) >= 2)
      .select(explode(Dedup.orderedPairsOf(col("is"))).as("p"))
      .groupBy(col("p.id_a").as("item_a"), col("p.id_b").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minPairSupport)

    val tot = items.agg(countDistinct(col("b")).cast("double").as("__n"))
    pairs
      .join(freq.select(col("i").as("item_a"), col("s").as("__sa")), Seq("item_a"))
      .join(freq.select(col("i").as("item_b"), col("s").as("__sb")), Seq("item_b"))
      .crossJoin(broadcast(tot))
  }
}

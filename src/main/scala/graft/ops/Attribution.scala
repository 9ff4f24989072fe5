package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Revenue attribution over an event stream: each conversion distributes
  * its value across the subject's preceding touches inside a lookback
  * window, under one of the standard models (last-touch, linear,
  * time-decay, position-based — the Shapley-lite family every marketing /
  * growth warehouse ships). The reference has no analytics beyond
  * extract-load (SURVEY.md §0); this is north-star surface beside the
  * events family.
  *
  * Scale design: ONE user-keyed range join (AsOf.rangeJoin — equi-join on
  * the subject key plus a time-range filter, sort-merge class, never a
  * per-conversion rescan of the stream), then per-conversion normalizers
  * from windows PARTITIONED BY the conversion id — group count grows with
  * conversions, each frame is touches-per-conversion-sized (lookback-
  * bounded). Unmatched conversions fall to a `direct` channel via one
  * keys-only anti-join. The pair frame is localCheckpoint'ed: it feeds
  * every credit leg and the anti-join.
  */
object Attribution {

  /** Per-(conversion, touch) credit rows under all requested models at
    * once — callers aggregate to taste (see [[report]]).
    *
    * @param conversions frame with `idCol` (unique conversion id),
    *                    `keyCol`, `timeCol`, `valueCol`
    * @param touches     frame with `keyCol`, `timeCol`, `channelCol`
    * @param lookback    window interval (e.g. `expr("INTERVAL 7 DAYS")`)
    * @param halfLife    time-decay half-life in MICROSECONDS (default
    *                    3.5 days = 3.024e11 μs)
    * @param uShape      position-based end weight: first and last touch
    *                    each take `uShape`, the middle splits the rest
    *                    (default 0.4 — the classic 40/20/40)
    * @return one row per retained (conversion, touch) pair plus one
    *         `direct` row per untouched conversion: (idCol, channel,
    *         credit_last, credit_linear, credit_decay, credit_position)
    */
  def credits(
      conversions: DataFrame,
      touches: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      valueCol: String,
      channelCol: String,
      lookback: Column,
      halfLife: Double = 3.024e11,
      uShape: Double = 0.4): DataFrame = {
    require(halfLife > 0, s"halfLife must be positive: $halfLife")
    require(uShape > 0 && uShape <= 0.5, s"uShape must be in (0, 0.5]: $uShape")
    val pairs = AsOf.rangeJoin(
        conversions.select(col(idCol), col(keyCol), col(timeCol), col(valueCol)),
        touches.select(col(keyCol), col(timeCol), col(channelCol)),
        Seq(keyCol), timeCol, timeCol, lookback)
      .localCheckpoint() // feeds every credit leg AND the direct anti-join
    val w = Window.partitionBy(idCol)
    // deterministic within-conversion touch order for last/position:
    // time, then channel (engines must agree on equal-time ties)
    val ord = Window.partitionBy(idCol)
      .orderBy(col(s"r_$timeCol"), col(s"r_$channelCol"))
    val scored = pairs
      .withColumn("__age_us",
        unix_micros(col(timeCol)) - unix_micros(col(s"r_$timeCol")))
      .withColumn("__wd", pow(lit(0.5), col("__age_us") / lit(halfLife)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__wsum", sum("__wd").over(w))
      .withColumn("__pos", row_number().over(ord))
      .withColumn("__wpos",
        when(col("__n") === 1, lit(1.0))
          .when(col("__n") === 2, lit(0.5))
          .when(col("__pos") === 1 || col("__pos") === col("__n"), lit(uShape))
          .otherwise(lit(1.0 - 2 * uShape) / (col("__n") - lit(2))))
      .select(col(idCol), col(s"r_$channelCol").as("channel"),
        (col(valueCol) * when(col("__pos") === col("__n"), 1.0).otherwise(0.0))
          .as("credit_last"),
        (col(valueCol) / col("__n")).as("credit_linear"),
        (col(valueCol) * col("__wd") / col("__wsum")).as("credit_decay"),
        (col(valueCol) * col("__wpos")).as("credit_position"))
    val direct = conversions
      .join(pairs.select(idCol), Seq(idCol), "left_anti")
      .select(col(idCol), lit("direct").as("channel"),
        col(valueCol).cast("double").as("credit_last"),
        col(valueCol).cast("double").as("credit_linear"),
        col(valueCol).cast("double").as("credit_decay"),
        col(valueCol).cast("double").as("credit_position"))
    scored.unionByName(direct)
  }

  /** Per-channel roll-up of [[credits]]: credit row count plus the four
    * models' attributed value, 4-dp rounded (the comparison read-out a
    * marketing report shows side by side).
    */
  def report(creditRows: DataFrame): DataFrame =
    creditRows.groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        round(sum("credit_last"), 4).as("last_value"),
        round(sum("credit_linear"), 4).as("linear_value"),
        round(sum("credit_decay"), 4).as("decay_value"),
        round(sum("credit_position"), 4).as("position_value"))

  /** Pseudo-states of the [[markovRemovalEffect]] chain — double
    * underscores keep them disjoint from any real channel name.
    */
  val StartState = "__start"
  val ConvState = "__conv"
  val NullState = "__null"

  /** DATA-DRIVEN attribution by Markov removal effect (Anderl et al.
    * 2014's standard model — the next step after the four heuristics in
    * [[credits]]): build the first-order channel-transition chain from
    * observed journeys, and credit each channel by how much the
    * conversion probability DROPS when that channel is removed
    * (transitions into it redirect to the null absorber):
    * `RE_c = max(0, 1 − P_c(conv|start) / P(conv|start))`, value share
    * `V · RE_c / ΣRE`.
    *
    * Journeys: per subject, events ordered by (time, id) split AT each
    * conversion — a conversion terminates its journey, the touches after
    * the subject's last conversion form a trailing journey absorbed by
    * NULL. Transitions: start → first state, touch → touch, last touch →
    * conv/null (a touchless conversion contributes start → conv).
    *
    * Absorption probabilities come from `iterations` synchronous Jacobi
    * steps of `p ← Q·p + b` (p(conv) pinned at 1 via an absorbing
    * self-loop) — after N steps p(start) is exactly the probability of
    * converting within N transitions, a deterministic quantity the
    * DuckDB oracle replays with an unrolled recursive CTE at the same N.
    *
    * Scale shape: the DISTRIBUTED work is two window passes and one
    * (from, to) count aggregate; the chain itself is
    * channel-cardinality-sized, so the transition matrix is a k²-bounded
    * collect (the model-state collect family — centroid-sized) and the
    * per-removal solves are driver-side arithmetic on a ~k×k matrix,
    * never a per-removal data rescan.
    */
  def markovRemovalEffect(
      events: DataFrame,
      keyCol: String,
      timeCol: String,
      typeCol: String,
      idCol: String,
      convType: String,
      valueCol: String,
      iterations: Int = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val spark = events.sparkSession
    import spark.implicits._
    val userW = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val base = events
      .select(col(keyCol), col(timeCol), col(idCol),
        col(typeCol).cast("string").as("__ch"),
        (col(typeCol) === convType).as("__isconv"))
      .withColumn("__jid",
        coalesce(sum(when(col("__isconv"), 1L).otherwise(0L))
          .over(userW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val jW = Window.partitionBy(col(keyCol), col("__jid"))
      .orderBy(col(timeCol), col(idCol))
    // one transition per event row: (previous state in the journey |
    // start) → (own channel | conv)
    val stepEdges = base
      .select(
        coalesce(lag(col("__ch"), 1).over(jW), lit(StartState)).as("__from"),
        when(col("__isconv"), lit(ConvState)).otherwise(col("__ch")).as("__to"))
    // trailing (conversion-less) journeys: last touch → null absorber
    val jAll = Window.partitionBy(col(keyCol), col("__jid"))
    val nullEdges = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__jid"))
          .orderBy(col(timeCol).desc, col(idCol).desc)))
      .withColumn("__hc",
        max(when(col("__isconv"), 1).otherwise(0)).over(jAll))
      .filter(col("__rn") === 1 && col("__hc") === 0)
      .select(col("__ch").as("__from"), lit(NullState).as("__to"))
    // k²-bounded collect: rows ≤ (channels + pseudo-states)²
    val edges = stepEdges.unionByName(nullEdges)
      .groupBy("__from", "__to").agg(count(lit(1)).cast("double").as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    require(edges.forall(e => e._1 != null && e._2 != null),
      s"markovRemovalEffect needs non-null '$typeCol' values: a NULL " +
        "channel has no state identity (clean or filter the stream first)")
    val totalValue = events.filter(col(typeCol) === convType)
      .agg(coalesce(sum(col(valueCol)), lit(0.0)).cast("double"))
      .head().getDouble(0)
    val channels = edges.iterator
      .flatMap { case (f, t, _) => Iterator(f, t) }
      .filterNot(Set(StartState, ConvState, NullState)).toSeq.distinct.sorted
    require(channels.forall(c => !c.startsWith("__")),
      s"channel names may not use the '__' pseudo-state prefix: " +
        channels.filter(_.startsWith("__")).mkString(", "))
    if (channels.isEmpty)
      return Seq.empty[(String, Double, Double)]
        .toDF("channel", "removal_effect", "markov_value")
    // row-normalized probabilities + absorbing self-loops; targets sorted
    // for a deterministic summation order
    val outMass = edges.groupBy(_._1).map { case (f, es) => f -> es.map(_._3).sum }
    val byFrom: Map[String, Seq[(String, Double)]] =
      (edges.map { case (f, t, n) => (f, t, n / outMass(f)) }
        ++ Seq((ConvState, ConvState, 1.0), (NullState, NullState, 1.0)))
        .groupBy(_._1).map { case (f, es) =>
          f -> es.map(e => (e._2, e._3)).sortBy(_._1).toSeq
        }
    val states = (channels ++ Seq(StartState, ConvState, NullState))
    // None = full graph — an Option, not a string sentinel, so no real
    // channel name can ever collide with "nothing removed"
    def absorbAtStart(removed: Option[String]): Double = {
      var p = states.map(s => s -> (if (s == ConvState) 1.0 else 0.0)).toMap
      var i = 0
      while (i < iterations) {
        p = states.map { s =>
          s -> byFrom.getOrElse(s, Nil).iterator.map { case (t, pr) =>
            pr * (if (removed.contains(t)) 0.0 else p(t))
          }.sum
        }.toMap
        i += 1
      }
      p(StartState)
    }
    val pFull = absorbAtStart(removed = None)
    val re = channels.map { c =>
      c -> (if (pFull > 0) math.max(0.0, 1.0 - absorbAtStart(Some(c)) / pFull)
            else 0.0)
    }
    val reSum = re.map(_._2).sum
    re.map { case (c, r) =>
      val share = if (reSum > 0) totalValue * r / reSum else 0.0
      (c, math.round(r * 1e4) / 1e4, math.round(share * 1e4) / 1e4)
    }.toDF("channel", "removal_effect", "markov_value")
  }
}

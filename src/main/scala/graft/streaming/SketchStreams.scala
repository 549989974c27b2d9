package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming sketch maintenance — the ingest-time half of the KMV story
  * (`orders_kmv_distinct` builds the same sketch as a batch artifact):
  * the k-minimum-values state merges like a semilattice (the k smallest
  * of a union are the k smallest of the merged k-min sets), so a keyed
  * state of at most k longs per group stays EXACTLY the batch sketch
  * under any micro-batch split and arrival order. This is the property
  * that makes KMV (unlike a raw COUNT DISTINCT) maintainable at any
  * ingest rate: per-batch work is a bounded merge, state never grows
  * past k·8 bytes per group, and the served estimate is bit-identical
  * to a from-scratch rebuild (StreamingSpec asserts it against an
  * independent plain-Scala reference).
  */
object SketchStreams {

  /** Maintain the per-group KMV sketch over an arriving (grp, h) stream;
    * emits the group's CURRENT sketch readout after each micro-batch:
    * (grp, n_kept, u_k — the k-th distinct minimum, or null below k —
    * and the (k−1)/normalized-u_k estimate, exactly the
    * `orders_kmv_distinct` estimator).
    */
  def kmvDistinct(rows: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("CAST(grp AS STRING) AS grp", "CAST(h AS BIGINT) AS h")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[(String, Long)],
         state: GroupState[Array[Long]]) => {
          val prior = state.getOption.getOrElse(Array.empty[Long])
          // bounded merge: distinct union of prior k-mins and the batch's
          // hashes, re-cut to the k smallest — the semilattice step
          val merged = (prior.iterator ++ batch.map(_._2))
            .toArray.distinct.sorted.take(k)
          state.update(merged)
          val nKept = merged.length
          val uK = if (nKept >= k) Some(merged(k - 1)) else None
          val est = uK match {
            case Some(u) => (k - 1).toDouble / (u / 1152921504606846976.0)
            case None => nKept.toDouble
          }
          Iterator((grp, nKept.toLong, uK, est))
        })
      .toDF("grp", "n_kept", "u_k", "kmv_estimate")
  }

  /** Maintain the per-group BOTTOM-K-HASH QUANTILE sketch over an
    * arriving (grp, ok, h, v) stream — the streaming half of
    * `orders_bottomk_quantiles` (RelationalQueries), and the quantile
    * analogue of [[kmvDistinct]]: the state is the k rows with the
    * smallest (h, ok) per group, which merges like a semilattice (the
    * k smallest of a union are the k smallest of the merged k-min
    * sets), so the final state is EXACTLY the batch sketch under any
    * micro-batch split and arrival order — StreamingSpec asserts the
    * served estimates bit-match the batch query's. Emits per batch:
    * (grp, m, est per quantile in
    * [[graft.relational.RelationalQueries.QsPairs]]), each estimate the
    * ceil(q·m)-th smallest sampled value under the same (v, ok) total
    * order and the same IEEE ceil(q·m) product as the batch/oracle
    * arithmetic.
    */
  def bottomkQuantiles(rows: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    val qs = graft.relational.RelationalQueries.QsPairs.map(_._1)
    require(qs.length == 3, "emission schema is pinned to three quantiles")
    rows.selectExpr("CAST(grp AS STRING) AS grp", "CAST(ok AS BIGINT) AS ok",
        "CAST(h AS BIGINT) AS h", "CAST(v AS DOUBLE) AS v")
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[(String, Long, Long, Double)],
         state: GroupState[Array[(Long, Long, Double)]]) => {
          val prior = state.getOption.getOrElse(Array.empty[(Long, Long, Double)])
          // bounded semilattice merge: distinct union of prior k-mins and
          // the batch's (h, ok, v) rows, re-cut to the k smallest
          val merged = (prior.iterator ++ batch.map(t => (t._3, t._2, t._4)))
            .toArray.distinct.sortBy(t => (t._1, t._2)).take(k)
          state.update(merged)
          val m = merged.length
          val byVal = merged.sortBy(t => (t._3, t._2))
          val est = qs.map(q =>
            byVal(math.ceil(q * m).toInt - 1)._3)
          Iterator((grp, m.toLong, est(0), est(1), est(2)))
        })
      .toDF("grp", "m", "est_p50", "est_p90", "est_p99")
  }

  /** Maintain a per-group Misra-Gries heavy-hitter summary over an
    * arriving (grp, token) stream; emits the group's CURRENT state after
    * each micro-batch: total count n, decrement total err, and the live
    * (token, counter) slots sorted by token.
    *
    * State is k counters + two longs per group — BOUNDED at any ingest
    * rate, like [[kmvDistinct]]. The split-parity property differs in
    * kind and the spec asserts exactly it: MG is a SEQUENTIAL FOLD, and
    * folding is associative over stream concatenation
    * (fold(fold(s, A), B) = fold(s, A ++ B)), so the final state after
    * the SAME TOTAL ARRIVAL SEQUENCE is identical under any micro-batch
    * split — counter values and all. That premise is only guaranteed
    * when in-group arrival order is itself reproducible (a single input
    * partition, or an ordered replay, as in StreamingSpec's memory-source
    * fixtures): with a multi-partition source, flatMapGroupsWithState
    * makes no in-group arrival-order promise, so counter VALUES can
    * differ between runs even at the same split. (Reordering arrivals
    * may move counter values, as in any MG; the guarantee bands — every
    * counter in [f-err, f], every item with f > n/(k+1) present,
    * err <= n/(k+1) — hold at every emission under EVERY order, and the
    * batch twin `corpus_heavy_hitters` grades those same bands.)
    */
  def mgHeavyHitters(rows: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("CAST(grp AS STRING) AS grp",
        "CAST(token AS STRING) AS token")
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (grp: String, batch: Iterator[(String, String)],
         state: GroupState[(Long, Long, Map[String, Long])]) => {
          var (n, err, counts) =
            state.getOption.getOrElse((0L, 0L, Map.empty[String, Long]))
          batch.foreach { case (_, t) =>
            n += 1L
            counts.get(t) match {
              case Some(c) => counts = counts.updated(t, c + 1L)
              case None if counts.size < k => counts = counts.updated(t, 1L)
              case None =>
                err += 1L
                counts = counts.flatMap { case (key, c) =>
                  if (c == 1L) None else Some(key -> (c - 1L))
                }
            }
          }
          state.update((n, err, counts))
          val sorted = counts.toSeq.sortBy(_._1)
          Iterator((grp, n, err, sorted.map(_._1), sorted.map(_._2)))
        })
      .toDF("grp", "n", "err", "tokens", "cnts")
  }
}

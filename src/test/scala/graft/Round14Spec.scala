package graft

import graft.operators.{Events, Similarity}
import org.apache.spark.sql.functions._

/** Round-14 semantic pins for the two new oracle rows. */
class Round14Spec extends SparkSpec {

  test("ann_ivf_nprobe_curve: recall and scan cost are monotone in nprobe; levels tie out to ann_ivf_recall") {
    val curve = Similarity.ivfNprobeCurve(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L), s"levels: ${curve.toSeq}")
    // widening the probe set can only add candidates: n_scanned never
    // drops per step (a probe level whose extra cells hold zero candidates
    // for every query is legal), and the full widening 1→4 must scan
    // strictly more than nprobe=1 on this data
    assert(curve.sliding(2).forall { case Array(a, b) => b._4 >= a._4 },
      s"n_scanned must be non-decreasing in nprobe: ${curve.toSeq}")
    assert(curve.last._4 > curve.head._4,
      s"n_scanned must grow overall (nprobe 1 → ${curve.last._1}): ${curve.toSeq}")
    assert(curve.sliding(2).forall { case Array(a, b) => b._2 >= a._2 },
      s"n_hits must be non-decreasing in nprobe: ${curve.toSeq}")
    // the curve's p=1 / p=2 levels are the SAME estimand ann_ivf_recall
    // reports per query — the two operators must agree on total hits
    val recall = Similarity.ivfRecall(spark, Sf)
      .agg(sum(col("n_hits_ivf")), sum(col("n_hits_probe2"))).head()
    assert(curve(0)._2 == recall.getLong(0),
      s"nprobe=1 hits ${curve(0)._2} != ann_ivf_recall ivf hits ${recall.getLong(0)}")
    assert(curve(1)._2 == recall.getLong(1),
      s"nprobe=2 hits ${curve(1)._2} != ann_ivf_recall probe2 hits ${recall.getLong(1)}")
  }

  test("ev_markov_stationary: bit-identical to the plain-Scala integer power iteration") {
    val evs = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // reference: same lag-window edge extraction, same integer folds
    val edges = evs.groupBy(_._1).iterator.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Array(a, b) => (a._3, b._3)
      }
    }.toSeq
    val cnt = edges.groupBy(identity).map { case ((f, t), g) => (f, t, g.size.toLong) }
    val rowTotal = cnt.groupBy(_._1).map { case (f, g) => f -> g.map(_._3).sum }
    var v: Map[String, Long] = cnt.map(_._1).toSeq.distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3)
      v = cnt.toSeq.flatMap { case (f, t, n) =>
        v.get(f).map(m => t -> m * n / rowTotal(f))
      }.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val tot = v.values.sum
    val expected = v.toSeq.sortBy(_._1)
      .map { case (t, m) => (t, m, m * 10000 / tot) }
    val got = Events.markovStationary(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"stationary divergence:\n got $got\n exp $expected")
    // floor division can only shed mass, never create it
    assert(tot <= 1000000L * v.size, s"mass grew: $tot")
  }
}

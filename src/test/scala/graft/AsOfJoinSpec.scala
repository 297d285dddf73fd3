package graft

import org.apache.spark.sql.graft.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom backward as-of join operator: two-table semantics the
  * catalog's window formulation cannot express (a genuine second table),
  * pinned on hand-computed fixtures. The catalog query `asof_join_exec` is
  * the oracle-checked large-scale form.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // key, q_ts, price
    ("A", 10L, 100L), ("A", 20L, 110L), ("A", 30L, 120L),
    ("B", 15L, 500L)).toDF("q_key", "q_ts", "price")
  private val trades = Seq(
    // key, t_ts, trade id
    ("A", 5L, 1L),   // before any quote -> null
    ("A", 10L, 2L),  // exactly at quote ts -> 100 (<= matches)
    ("A", 25L, 3L),  // between quotes -> 110 (latest at-or-before)
    ("A", 99L, 4L),  // after all -> 120 (last-known carry)
    ("B", 14L, 5L),  // B's quote is at 15 -> null
    ("C", 50L, 6L))  // key with no quotes at all -> null
    .toDF("t_key", "t_ts", "trade_id")

  private def run() = AsOfJoin(trades, quotes,
      Seq(col("t_key")), Seq(col("q_key")),
      Seq(col("t_ts")), Seq(col("q_ts")))
    .select(col("trade_id"), col("price"))
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("backward as-of carry: ties match, gaps carry, missing keys null-pad") {
    assert(run() === Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(110L),
      4L -> Some(120L), 5L -> None, 6L -> None))
  }

  test("self-join (shared lineage) resolves: right side re-aliased, no exprId clash") {
    // both sides carry the SAME un-aliased k/ts attributes (same exprIds) —
    // exactly the shape the dedup guard must re-alias; output columns are
    // read positionally (lOut ++ rOut) since both sides expose k/ts by name
    val base = quotes.select(col("q_key").as("k"), col("q_ts").as("ts"),
      col("price").as("p"))
    val left = base.select(col("k"), col("ts"), col("p").as("probe_p"))
    val right = base.select(col("k"), col("ts"), col("p").as("build_p"))
    assert(left.queryExecution.analyzed.outputSet
      .intersect(right.queryExecution.analyzed.outputSet).nonEmpty,
      "fixture must actually share exprIds across sides")
    val joined = AsOfJoin(left, right,
      Seq(col("k")), Seq(col("k")), Seq(col("ts")), Seq(col("ts")))
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(5))).toSet
    // every row as-of-matches itself (tie at its own ts ⇒ build_p = probe_p)
    assert(got === Set(
      ("A", 10L, 100L, 100L), ("A", 20L, 110L, 110L),
      ("A", 30L, 120L, 120L), ("B", 15L, 500L, 500L)))
  }

  test("forward as-of: earliest at-or-after, ties match, exhausted side nulls") {
    val got = AsOfJoin(trades, quotes,
        Seq(col("t_key")), Seq(col("q_key")),
        Seq(col("t_ts")), Seq(col("q_ts")), forward = true)
      .select(col("trade_id"), col("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(
      1L -> Some(100L), // A@5  → next quote A@10
      2L -> Some(100L), // A@10 → tie at exactly 10 matches (>=)
      3L -> Some(120L), // A@25 → next quote A@30
      4L -> None,       // A@99 → no quote after
      5L -> Some(500L), // B@14 → B@15
      6L -> None))      // C has no quotes at all
  }

  test("null keys: window semantics match null↔null, SQL mode never does") {
    // one null-key quote stream + null-key trades; a typed Option[String]
    // key column gives real SQL NULLs on both sides
    val nq = Seq((Option("A"), 10L, 100L), (Option.empty[String], 10L, 900L))
      .toDF("q_key", "q_ts", "price")
    val nt = Seq((Option("A"), 20L, 1L), (Option.empty[String], 20L, 2L),
        (Option.empty[String], 5L, 3L))
      .toDF("t_key", "t_ts", "trade_id")
    def run(matchNullKeys: Boolean) = AsOfJoin(nt, nq,
        Seq(col("t_key")), Seq(col("q_key")),
        Seq(col("t_ts")), Seq(col("q_ts")), matchNullKeys)
      .select(col("trade_id"), col("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // default: null groups with null (PARTITION BY semantics) — trade 2 at
    // ts 20 sees the null-key quote at ts 10; trade 3 at ts 5 predates it
    assert(run(matchNullKeys = true) === Map(
      1L -> Some(100L), 2L -> Some(900L), 3L -> None))
    // SQL join semantics: a null key never matches anything
    assert(run(matchNullKeys = false) === Map(
      1L -> Some(100L), 2L -> None, 3L -> None))
  }

  test("plan is the sorted-merge operator: one exchange + sort per side, no window") {
    val df = AsOfJoin(trades, quotes,
      Seq(col("t_key")), Seq(col("q_key")),
      Seq(col("t_ts")), Seq(col("q_ts")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), "as-of must not fall back to a window")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("matches the window formulation on the events table (catalog oracle)") {
    val viaExec = SparkEntry.queries("asof_join_exec")(spark, sf001)
      .collect().map(_.toSeq.mkString("|")).toSeq
    val viaWindow = SparkEntry.queries("asof_join")(spark, sf001)
      .collect().map(_.toSeq.mkString("|")).toSeq
    assert(viaExec === viaWindow)
  }
}

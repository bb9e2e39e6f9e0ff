package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced relational shapes beyond the reference's surface (SURVEY.md §2.3
  * R12 notes the reference has none of these — they come free with Catalyst
  * and round out the "complete engine" story): group-having fact
  * aggregation feeding a join (TPC-H Q18 shape), a correlated scalar
  * subquery that Catalyst decorrelates into an aggregate+join (Q2 shape),
  * and CUBE grouping sets.
  */
object AdvancedRelQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Q18 shape: large-quantity orders — HAVING on the fact aggregation,
    // then joins back to orders and customer (broadcast dim).
    "q49_big_orders" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val big = l.groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // Q2 shape: per-nation best supplier via a correlated scalar subquery —
    // expressed in SQL so Catalyst's decorrelation rewrites it into an
    // aggregate + join (verified: no per-row subquery execution in the plan).
    "q50_best_supplier" -> ((s, d) => {
      Tables(s, d, "supplier").createOrReplaceTempView("supplier_v")
      Tables(s, d, "nation").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
          |FROM supplier_v s JOIN nation_v n ON s.s_nationkey = n.n_nationkey
          |WHERE s.s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier_v s2
          |                     WHERE s2.s_nationkey = s.s_nationkey)
          |ORDER BY n.n_name, s.s_name""".stripMargin)
    }),

    // CUBE over (metric, source bucket): all grouping-set combinations with
    // a grouping id, in one pass.
    "q51_metric_cube" -> ((s, d) => {
      Tables.cleanEvents(s, d)
        .withColumn("source_bucket", (col("source_id") % 4).cast("int"))
        .cube(col("metric"), col("source_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"),
          grouping_id().cast("int").as("gid")) // must live inside the agg
        .orderBy(col("gid"), col("metric"), col("source_bucket"))
    }),

    // Backward as-of join (merge shape, one shuffle): each click event
    // picks up the latest error event at-or-before it for the same user;
    // oracle-checked against DuckDB's native ASOF JOIN.
    "q53_asof_lasterr" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val errors0 = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("err_event_id"), col("value").as("err_value"))
      val errW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_us")).orderBy(col("err_event_id").desc)
      val errors = errors0.withColumn("__rn", row_number().over(errW))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.backward(clicks, errors, Seq("user_id"), "ts_us", "ts_us")
        .orderBy("event_id")
    }),

    // Banded range join: orders matched to exponential price bands with no
    // equi-key — bucket explosion turns the nested-loop into a hash join.
    "q54_range_price_bands" -> ((s, d) => {
      val bands = s.range(0, 12).select(col("id").as("band_id"),
        (pow(lit(2.0), col("id")) * 500.0).as("lo"),
        (pow(lit(2.0), col("id") + 1) * 500.0).as("hi"))
      graft.operators.RangeJoin.pointInRange(
          Tables(s, d, "orders"), bands, "o_totalprice", "lo", "hi", bandWidth = 50000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("price_sum"))
        .orderBy("band_id")
    }),

    // Ranking window functions over per-metric daily totals; the ORDER BY
    // includes the date so ntile's row order (and thus every rank) is total.
    "q55_metric_ranks" -> ((s, d) => {
      val md = Tables.cleanEvents(s, d)
        .groupBy(col("metric"), to_date(col("ts")).as("metric_date"))
        .agg(round(sum(col("value")), 2).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("metric")).orderBy(col("v").asc, col("metric_date").asc)
      md.select(col("metric"), col("metric_date"), col("v"),
          dense_rank().over(w).as("dr"),
          round(percent_rank().over(w), 6).as("pr"),
          ntile(4).over(w).as("quartile"))
        .orderBy("metric", "metric_date")
    }),

    // Two-phase salted aggregation under the oracle gate: algebraic
    // aggregates recombine exactly, so the salted result must equal the
    // plain GROUP BY — which is precisely what the oracle SQL computes.
    "q56_salted_kpi" -> ((s, d) => {
      val ev = Tables.cleanEvents(s, d).withColumn("metric_date", to_date(col("ts")))
      graft.operators.Skew.saltedDailyAgg(ev, Seq("metric", "metric_date"), "value")
        .select(col("metric"), col("metric_date"),
          round(col("value_sum"), 2).as("value_sum"), col("value_count"),
          col("value_min"), col("value_max"), round(col("value_avg"), 6).as("value_avg"))
        .orderBy("metric", "metric_date")
    }),

    // Set operations (absent from the reference, SURVEY §2.3 R12):
    // (user, day) pairs with clicks but no errors / with both.
    "q57_set_except" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      ev.filter(col("event_type") === "click").select(col("user_id"), col("day"))
        .except(ev.filter(col("event_type") === "error").select(col("user_id"), col("day")))
        .orderBy("user_id", "day")
    }),

    "q58_set_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy("user_id")
    }),

    // Forward as-of join (same merge shape as q53, window flipped): each
    // error event picks up the NEXT click at-or-after it for the same user —
    // the "time-to-next-action" lookup; oracle-checked against DuckDB's
    // native ASOF JOIN with a <= inequality.
    "q63_asof_nextclick" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val clicks0 = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_event_id"), col("value").as("click_value"))
      val clkW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_us")).orderBy(col("click_event_id").desc)
      val clicks = clicks0.withColumn("__rn", row_number().over(clkW))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.forward(errors, clicks, Seq("user_id"), "ts_us", "ts_us")
        .orderBy("event_id")
    }),

    // Semi/anti joins (the EXISTS / NOT EXISTS shapes): per nation, how many
    // customers have at least one order vs none. Both probe sides build ONE
    // hash table on the distinct custkeys — no payload duplication, no
    // row-multiplying join — and the nation dim is broadcast.
    "q64_semi_anti" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").select(col("o_custkey"))
      val n = Tables(s, d, "nation")
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("with_orders"))
      val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("without_orders"))
      // The aggregated sides are ≤ |nation| rows, and they are the BUILD
      // (right) sides of the left-outer joins — Spark cannot build the left
      // side of a left outer join, so hinting the nation dim there would be
      // silently dropped (with a HintErrorLogger WARN per run).
      n.select(col("n_nationkey"), col("n_name"))
        .join(broadcast(withO), col("n_nationkey") === withO("c_nationkey"), "left").drop("c_nationkey")
        .join(broadcast(withoutO), col("n_nationkey") === withoutO("c_nationkey"), "left").drop("c_nationkey")
        .select(col("n_name"),
          coalesce(col("with_orders"), lit(0L)).as("with_orders"),
          coalesce(col("without_orders"), lit(0L)).as("without_orders"))
        .orderBy("n_name")
    }),

    // Pivot: daily event values spread into one column per event type. The
    // value list is explicit, so the plan is a single pass (no extra
    // values-discovery job) — the form that survives at scale.
    "q65_metric_pivot" -> ((s, d) => {
      Tables.cleanEvents(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("day"))
        .pivot(col("metric"), Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("value")), 2))
        .orderBy("day")
    }),

    // Unpivot (melt): the wide daily matrix back to long form — pivot's
    // inverse, a pure projection + generator (no shuffle beyond the
    // upstream aggregation). Standard unpivot semantics drop NULL cells.
    "q67_unpivot" -> ((s, d) => {
      val wide = Tables.cleanEvents(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("day"))
        .pivot(col("metric"), Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("value")), 2))
      wide.unpivot(Array(col("day")), "metric", "value_sum")
        .filter(col("value_sum").isNotNull)
        .orderBy("day", "metric")
    }),

    // Range-frame rolling window: trailing-7-day sum over per-metric daily
    // totals — a RANGE frame (value-based, gap-aware), unlike the ROWS
    // frames elsewhere. Cents sum as integers so the frame total is
    // order-independent and cross-engine exact.
    "q68_rolling_7d" -> ((s, d) => {
      val daily = Tables.cleanEvents(s, d)
        .groupBy(col("metric"), to_date(col("ts")).as("metric_date"))
        .agg(round(sum(col("value")), 2).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("metric")).orderBy(unix_date(col("metric_date")))
        .rangeBetween(-6, 0)
      daily.select(col("metric"), col("metric_date"), col("v"),
          (sum(floor(col("v") * 100 + 0.5).cast("long")).over(w) / 100.0).as("rolling_7d"))
        .orderBy("metric", "metric_date")
    }),

    // Salted equi-join under the oracle gate: clicks (the "skewed" fact)
    // joined to per-user error counts through (key, salt) — the result must
    // equal the plain join the oracle computes.
    "q69_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("value"))
      val errN = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("err_n"))
      graft.operators.Skew.saltedJoin(clicks, errN, "user_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("err_n")).as("err_n"),
          round(sum(col("value")), 2).as("click_value"))
        .orderBy("user_id")
    }),

    // Value-window family (first/last/nth/lead) over per-metric daily
    // totals: the "compare each day to the series' anchor points" shape.
    // last_value needs the full-partition frame — the default frame stops
    // at CURRENT ROW, which silently yields a running last.
    "q71_window_values" -> ((s, d) => {
      val daily = Tables.cleanEvents(s, d)
        .groupBy(col("metric"), to_date(col("ts")).as("metric_date"))
        .agg(round(sum(col("value")), 2).as("v"))
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("metric")).orderBy(col("metric_date"))
      val wFull = wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      daily.select(col("metric"), col("metric_date"), col("v"),
          first(col("v")).over(wFull).as("first_v"),
          last(col("v")).over(wFull).as("last_v"),
          nth_value(col("v"), 3).over(wFull).as("third_v"),
          lead(col("v"), 1).over(wOrd).as("next_v"))
        .orderBy("metric", "metric_date")
    }),

    // Tolerance as-of join: each click picks up the latest error at most 30
    // minutes old — merge_asof(tolerance=...) semantics. The oracle is an
    // independent DuckDB LATERAL top-1 subquery, not a mirror of the
    // window construction.
    "q73_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val errors0 = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("err_event_id"), col("value").as("err_value"))
      val errW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_us")).orderBy(col("err_event_id").desc)
      val errors = errors0.withColumn("__rn", row_number().over(errW))
        .filter(col("__rn") === 1).drop("__rn")
      graft.operators.AsofJoin.backward(clicks, errors, Seq("user_id"), "ts_us", "ts_us",
          joinType = "left", tolerance = Some(30L * 60 * 1000000))
        .orderBy("event_id")
    }),

    // SCD Type-2 dimension build: signup events are the change log of each
    // user's plan tier; versions collapse no-op changes and carry half-open
    // validity intervals. Two windows over one (user ORDER BY ts) exchange.
    "q135_scd2_build" -> ((s, d) => {
      graft.operators.Scd.type2(scdChanges(s, d), Seq("user_id"), "ts_us",
          Seq("plan_tier"))
        .orderBy("user_id", "version")
    }),

    // Point-in-time (as-of) dimension lookup: each purchase picks up the
    // plan version valid when it happened — the backward as-of merge shape,
    // NOT a fact x versions range join; oracle-checked against DuckDB's
    // native ASOF LEFT JOIN over the same Type-2 build.
    "q136_scd2_pit" -> ((s, d) => {
      val dim = graft.operators.Scd.type2(scdChanges(s, d), Seq("user_id"),
        "ts_us", Seq("plan_tier"))
      val facts = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      graft.operators.Scd.pointInTime(facts, dim, Seq("user_id"), "ts_us",
          Seq("plan_tier", "version"))
        .orderBy("event_id")
    }),

    // SCD2 store LIFECYCLE gate (the q119/q124/q126 treatment for the
    // streaming-maintained dimension): the change log arrives as three
    // micro-batches DELIBERATELY OUT OF TIME ORDER (ts_us % 3 splits), each
    // through scdUpsertBatch's bucket-incremental recompute, then the
    // change log compacts — and the read-back dimension must hash-match
    // q135's monolithic build (oracle verbatim). A lost append, a replayed
    // batch, or a late change that failed to resurrect/collapse a version
    // shifts some interval and fails the hash.
    "q145_scd2_lifecycle" -> ((s, d) => {
      val path = scdStorePath(d)
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ch = scdChanges(s, d)
      val up = graft.streaming.StreamingPipeline.scdUpsertBatch(
        path, Seq("user_id"), "ts_us", Seq("plan_tier")) _
      up(ch.filter(col("ts_us") % 3 === 0), 0L)
      up(ch.filter(col("ts_us") % 3 === 1), 1L)
      up(ch.filter(col("ts_us") % 3 === 2), 2L)
      graft.streaming.StreamingPipeline.compactScdChanges(s, path)
      graft.streaming.StreamingPipeline.readScdDim(s, path)
        .orderBy("user_id", "version")
    }),

    // Point-in-time lookup SERVED FROM the streamed store (q136's join, the
    // store's read path): the dimension q145's maintainer grew answers the
    // purchase lookups — must hash-match q136's oracle over the monolithic
    // build, proving the store is a drop-in serving artifact, not just a
    // write-path mirror.
    "q149_scd2_pit_store" -> ((s, d) => {
      val path = scdStorePath(d) + "_pit"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ch = scdChanges(s, d)
      val up = graft.streaming.StreamingPipeline.scdUpsertBatch(
        path, Seq("user_id"), "ts_us", Seq("plan_tier")) _
      up(ch.filter(col("ts_us") % 2 === 0), 0L)
      up(ch.filter(col("ts_us") % 2 === 1), 1L)
      val dim = graft.streaming.StreamingPipeline.readScdDim(s, path)
      val facts = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      graft.operators.Scd.pointInTime(facts, dim, Seq("user_id"), "ts_us",
          Seq("plan_tier", "version"))
        .orderBy("event_id")
    }),

    // SCD2 entity RETIREMENT — GDPR-style hard delete from the one store
    // family that lacked an un-learn path: the q145 build (three
    // out-of-time-order batches), then every user with user_id % 7 == 3
    // retires (ledgered tombstone at retireId 3 > every data batch, the
    // ANN stores' r > k rule with composite keys). The read-back dimension
    // must hash-match the monolithic Type-2 build over the SURVIVING
    // change log — serving hides the entities the moment retire returns,
    // BEFORE any compaction: a stale dim bucket, a missed bucket delete
    // (a bucket whose only keys retired must vanish, not linger), or a
    // liveness rule off by one at the ledger boundary shifts an interval
    // and fails the hash.
    "q204_scd2_retired" -> ((s, d) => {
      val path = scdStorePath(d) + "_ret"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ch = scdChanges(s, d)
      val up = graft.streaming.StreamingPipeline.scdUpsertBatch(
        path, Seq("user_id"), "ts_us", Seq("plan_tier")) _
      up(ch.filter(col("ts_us") % 3 === 0), 0L)
      up(ch.filter(col("ts_us") % 3 === 1), 1L)
      up(ch.filter(col("ts_us") % 3 === 2), 2L)
      graft.streaming.StreamingPipeline.retireScdEntities(s, path,
        ch.filter(col("user_id") % 7 === 3).select("user_id"), 3L,
        Seq("user_id"), "ts_us", Seq("plan_tier"))
      graft.streaming.StreamingPipeline.readScdDim(s, path)
        .orderBy("user_id", "version")
    }),

    // The retirement's FULL lifecycle incl. physical erasure and
    // RE-ONBOARDING: build, retire user_id % 7 == 3, compact (the rewrite
    // drops the dead rows, lands survivors at the max data id, blanks the
    // ledger — the hard-delete point), then the retired users COME BACK
    // at batch 4 > retireId 3 with only their even-ts changes (consent
    // re-granted is a fresh start: the strictly-greater rule admits the
    // new history, the erased odd-ts rows stay gone). The dimension must
    // hash-match the monolithic build over exactly that surviving set —
    // a compaction that misses the retirement transform resurrects erased
    // rows, one that over-applies kills the re-onboarded history.
    "q205_scd2_retire_cycle" -> ((s, d) => {
      val path = scdStorePath(d) + "_cyc"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ch = scdChanges(s, d)
      val up = graft.streaming.StreamingPipeline.scdUpsertBatch(
        path, Seq("user_id"), "ts_us", Seq("plan_tier")) _
      up(ch.filter(col("ts_us") % 3 === 0), 0L)
      up(ch.filter(col("ts_us") % 3 === 1), 1L)
      up(ch.filter(col("ts_us") % 3 === 2), 2L)
      graft.streaming.StreamingPipeline.retireScdEntities(s, path,
        ch.filter(col("user_id") % 7 === 3).select("user_id"), 3L,
        Seq("user_id"), "ts_us", Seq("plan_tier"))
      graft.streaming.StreamingPipeline.compactScdChanges(s, path, Seq("user_id"))
      up(ch.filter(col("user_id") % 7 === 3 && col("ts_us") % 2 === 0), 4L)
      graft.streaming.StreamingPipeline.readScdDim(s, path)
        .orderBy("user_id", "version")
    }),

    // The SERVING path after retirement — q136's point-in-time lookup
    // against the retired store (q149's read shape): purchases by erased
    // users must resolve to NO dimension version (NULL plan/version, the
    // ASOF LEFT JOIN's miss), not to a lingering one; everyone else's
    // lookups are untouched. Oracle = q136's ASOF JOIN with the dimension
    // rebuilt over survivors only.
    "q208_scd2_pit_retired" -> ((s, d) => {
      val path = scdStorePath(d) + "_pitret"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ch = scdChanges(s, d)
      val up = graft.streaming.StreamingPipeline.scdUpsertBatch(
        path, Seq("user_id"), "ts_us", Seq("plan_tier")) _
      up(ch.filter(col("ts_us") % 2 === 0), 0L)
      up(ch.filter(col("ts_us") % 2 === 1), 1L)
      graft.streaming.StreamingPipeline.retireScdEntities(s, path,
        ch.filter(col("user_id") % 7 === 3).select("user_id"), 2L,
        Seq("user_id"), "ts_us", Seq("plan_tier"))
      val dim = graft.streaming.StreamingPipeline.readScdDim(s, path)
      val facts = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      graft.operators.Scd.pointInTime(facts, dim, Seq("user_id"), "ts_us",
          Seq("plan_tier", "version"))
        .orderBy("event_id")
    }),

    // Explicit GROUPING SETS (vs q51's full CUBE): only the named
    // combinations aggregate — per-metric, per-bucket, and grand total.
    "q72_grouping_sets" -> ((s, d) => {
      Tables.cleanEvents(s, d)
        .withColumn("source_bucket", (col("source_id") % 4).cast("int"))
        .createOrReplaceTempView("ev_gs")
      s.sql(
        """SELECT metric, source_bucket, count(*) AS n,
          |  round(sum(value), 2) AS value_sum,
          |  CAST(grouping_id() AS INT) AS gid
          |FROM ev_gs
          |GROUP BY GROUPING SETS ((metric), (source_bucket), ())
          |ORDER BY gid, metric, source_bucket""".stripMargin)
    })
  )

  /** Shared change log for the SCD2 pair: signup events as plan-tier
    * changes, deduped to one row per (user, ts) with the greatest event_id
    * winning — the deterministic pick the oracle mirrors.
    */
  private def scdChanges(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts_us")).orderBy(col("event_id").desc)
    Tables.events(s, d)
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        (floor(col("value")).cast("int") % 3).cast("int").as("plan_tier"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "ts_us", "plan_tier")
  }

  /** Writable pid-namespaced location for the q145 SCD2 store (the
    * DataQueries.ivfIndexPath convention).
    */
  private def scdStorePath(d: String): String =
    sys.props("java.io.tmpdir") + "/graft_scd_store_p" +
      ProcessHandle.current().pid() + "_" + d.replaceAll("[^A-Za-z0-9]", "_")

  /** WITH-prefix shared by the q135/q136 oracles: the deduped change log,
    * collapse of no-op changes, and the versioned dimension. `pred` (over
    * `user_id`/`ts_us`) filters the change log — the retirement gates
    * (q204/q205) re-root the SAME dimension derivation on the surviving
    * changes.
    */
  private def scdDimCtes(pred: String = "1=1"): String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, event_type, value FROM events
      |),
      |sign0 AS (
      |  SELECT event_id, user_id, ts_us,
      |         CAST(CAST(floor(value) AS INT) % 3 AS INT) AS plan_tier
      |  FROM ev WHERE event_type = 'signup' AND ($pred)
      |),
      |changes AS (
      |  SELECT user_id, ts_us, plan_tier FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) AS rn
      |    FROM sign0) WHERE rn = 1
      |),
      |kept AS (
      |  SELECT user_id, ts_us, plan_tier FROM (
      |    SELECT *, lag(plan_tier) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
      |    FROM changes) WHERE plan_tier IS DISTINCT FROM prev
      |),
      |dim AS (
      |  SELECT user_id, plan_tier, ts_us AS effective_from,
      |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS effective_to,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS INT) AS version
      |  FROM kept
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q135_scd2_build" ->
      s"""${scdDimCtes()}
         |SELECT user_id, plan_tier, effective_from, effective_to,
         |  effective_to IS NULL AS is_current, version
         |FROM dim ORDER BY user_id, version""".stripMargin,
    // the streamed/compacted store must be invisible: q135's oracle verbatim
    "q145_scd2_lifecycle" ->
      s"""${scdDimCtes()}
         |SELECT user_id, plan_tier, effective_from, effective_to,
         |  effective_to IS NULL AS is_current, version
         |FROM dim ORDER BY user_id, version""".stripMargin,
    // the dim served right after retire = the monolithic build over the
    // surviving change log (erasure is immediate, pre-compaction)
    "q204_scd2_retired" ->
      s"""${scdDimCtes("user_id % 7 <> 3")}
         |SELECT user_id, plan_tier, effective_from, effective_to,
         |  effective_to IS NULL AS is_current, version
         |FROM dim ORDER BY user_id, version""".stripMargin,
    // retire -> compact (physical erasure) -> re-onboard: survivors =
    // everyone else's full history plus the retired users' even-ts
    // changes only (the batch-4 re-entry above the retirement id)
    "q205_scd2_retire_cycle" ->
      s"""${scdDimCtes("user_id % 7 <> 3 OR ts_us % 2 = 0")}
         |SELECT user_id, plan_tier, effective_from, effective_to,
         |  effective_to IS NULL AS is_current, version
         |FROM dim ORDER BY user_id, version""".stripMargin,
    // erased users' purchases resolve to NO version (ASOF miss -> NULLs)
    "q208_scd2_pit_retired" ->
      s"""${scdDimCtes("user_id % 7 <> 3")}
         |SELECT f.event_id, f.user_id, f.ts_us, f.value, d.plan_tier, d.version
         |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, value
         |      FROM events WHERE event_type = 'purchase') f
         |ASOF LEFT JOIN dim d
         |  ON f.user_id = d.user_id AND f.ts_us >= d.effective_from
         |ORDER BY f.event_id""".stripMargin,
    // the stored dim must serve lookups exactly: q136's oracle verbatim
    "q149_scd2_pit_store" ->
      s"""${scdDimCtes()}
         |SELECT f.event_id, f.user_id, f.ts_us, f.value, d.plan_tier, d.version
         |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, value
         |      FROM events WHERE event_type = 'purchase') f
         |ASOF LEFT JOIN dim d
         |  ON f.user_id = d.user_id AND f.ts_us >= d.effective_from
         |ORDER BY f.event_id""".stripMargin,
    "q136_scd2_pit" ->
      s"""${scdDimCtes()}
         |SELECT f.event_id, f.user_id, f.ts_us, f.value, d.plan_tier, d.version
         |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, value
         |      FROM events WHERE event_type = 'purchase') f
         |ASOF LEFT JOIN dim d
         |  ON f.user_id = d.user_id AND f.ts_us >= d.effective_from
         |ORDER BY f.event_id""".stripMargin,
    "q49_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 150.0
        |)
        |SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |  round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q50_best_supplier" ->
      """SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
        |                     WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY n.n_name, s.s_name""".stripMargin,
    "q51_metric_cube" ->
      """SELECT event_type AS metric, CAST(user_id % 4 AS INT) AS source_bucket,
        |  count(*) AS n, round(sum(value), 2) AS value_sum,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 4) AS INT) AS gid
        |FROM events
        |GROUP BY CUBE (event_type, user_id % 4)
        |ORDER BY gid, metric, source_bucket""".stripMargin,
    "q53_asof_lasterr" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, event_type, value FROM events
        |),
        |clicks AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'click'),
        |errors0 AS (SELECT user_id, ts_us, event_id AS err_event_id, value AS err_value
        |            FROM ev WHERE event_type = 'error'),
        |errors AS (
        |  SELECT user_id, ts_us, err_event_id, err_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY err_event_id DESC) AS rn
        |    FROM errors0) WHERE rn = 1
        |)
        |SELECT c.event_id, c.user_id, c.ts_us, c.value, e.err_event_id, e.err_value
        |FROM clicks c ASOF JOIN errors e ON c.user_id = e.user_id AND c.ts_us >= e.ts_us
        |ORDER BY c.event_id""".stripMargin,
    "q54_range_price_bands" ->
      """WITH bands AS (
        |  SELECT i AS band_id, 500.0 * power(2, i) AS lo, 500.0 * power(2, i + 1) AS hi
        |  FROM unnest(generate_series(0, 11)) AS t(i)
        |)
        |SELECT b.band_id, count(*) AS n, round(sum(o.o_totalprice), 2) AS price_sum
        |FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q55_metric_ranks" ->
      """WITH md AS (
        |  SELECT event_type AS metric, CAST(ts AS DATE) AS metric_date,
        |         round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT metric, metric_date, v,
        |  CAST(dense_rank() OVER w AS INT) AS dr,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM md WINDOW w AS (PARTITION BY metric ORDER BY v ASC, metric_date ASC)
        |ORDER BY metric, metric_date""".stripMargin,
    "q56_salted_kpi" ->
      """SELECT event_type AS metric, CAST(ts AS DATE) AS metric_date,
        |  round(sum(value), 2) AS value_sum, count(*) AS value_count,
        |  min(value) AS value_min, max(value) AS value_max,
        |  round(sum(value) / count(*), 6) AS value_avg
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q57_set_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type = 'error'
        |ORDER BY user_id, day""".stripMargin,
    "q58_set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,
    "q63_asof_nextclick" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, event_type, value FROM events
        |),
        |errors AS (SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'error'),
        |clicks0 AS (SELECT user_id, ts_us, event_id AS click_event_id, value AS click_value
        |            FROM ev WHERE event_type = 'click'),
        |clicks AS (
        |  SELECT user_id, ts_us, click_event_id, click_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY click_event_id DESC) AS rn
        |    FROM clicks0) WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts_us, e.value, c.click_event_id, c.click_value
        |FROM errors e ASOF JOIN clicks c ON e.user_id = c.user_id AND e.ts_us <= c.ts_us
        |ORDER BY e.event_id""".stripMargin,
    "q64_semi_anti" ->
      """WITH oc AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT n.n_name,
        |  count(*) FILTER (WHERE oc.o_custkey IS NOT NULL) AS with_orders,
        |  count(*) FILTER (WHERE c.c_custkey IS NOT NULL AND oc.o_custkey IS NULL) AS without_orders
        |FROM nation n
        |LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN oc ON oc.o_custkey = c.c_custkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q65_metric_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS click,
        |  round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS error,
        |  round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
        |  round(sum(value) FILTER (WHERE event_type = 'signup'), 2) AS signup,
        |  round(sum(value) FILTER (WHERE event_type = 'view'), 2) AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q67_unpivot" ->
      """WITH wide AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS click,
        |    round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS error,
        |    round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
        |    round(sum(value) FILTER (WHERE event_type = 'signup'), 2) AS signup,
        |    round(sum(value) FILTER (WHERE event_type = 'view'), 2) AS "view"
        |  FROM events GROUP BY 1
        |)
        |SELECT day, metric, value_sum
        |FROM wide UNPIVOT (value_sum FOR metric IN (click, error, purchase, signup, "view"))
        |ORDER BY day, metric""".stripMargin,
    "q68_rolling_7d" ->
      """WITH daily AS (
        |  SELECT event_type AS metric, CAST(ts AS DATE) AS metric_date,
        |         round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT metric, metric_date, v,
        |  sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY metric ORDER BY metric_date
        |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) / 100.0 AS rolling_7d
        |FROM daily ORDER BY metric, metric_date""".stripMargin,
    "q69_salted_join" ->
      """WITH err AS (
        |  SELECT user_id, count(*) AS err_n FROM events
        |  WHERE event_type = 'error' GROUP BY 1
        |)
        |SELECT c.user_id, count(*) AS n_clicks, min(e.err_n) AS err_n,
        |  round(sum(c.value), 2) AS click_value
        |FROM events c JOIN err e ON c.user_id = e.user_id
        |WHERE c.event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q71_window_values" ->
      """WITH daily AS (
        |  SELECT event_type AS metric, CAST(ts AS DATE) AS metric_date,
        |         round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT metric, metric_date, v,
        |  first_value(v) OVER wf AS first_v,
        |  last_value(v) OVER wf AS last_v,
        |  nth_value(v, 3) OVER wf AS third_v,
        |  lead(v, 1) OVER wo AS next_v
        |FROM daily
        |WINDOW
        |  wf AS (PARTITION BY metric ORDER BY metric_date
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  wo AS (PARTITION BY metric ORDER BY metric_date)
        |ORDER BY metric, metric_date""".stripMargin,
    "q73_asof_tolerance" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, event_type, value FROM events
        |),
        |clicks AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |errors0 AS (SELECT user_id, ts_us, event_id AS err_event_id, value AS err_value
        |            FROM ev WHERE event_type = 'error'),
        |errors AS (
        |  SELECT user_id, ts_us, err_event_id, err_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us ORDER BY err_event_id DESC) AS rn
        |    FROM errors0) WHERE rn = 1
        |)
        |SELECT c.event_id, c.user_id, c.ts_us, m.err_event_id, m.err_value
        |FROM clicks c
        |LEFT JOIN LATERAL (
        |  SELECT e.err_event_id, e.err_value
        |  FROM errors e
        |  WHERE e.user_id = c.user_id AND e.ts_us <= c.ts_us
        |    AND e.ts_us >= c.ts_us - 30*60*1000000
        |  ORDER BY e.ts_us DESC LIMIT 1
        |) m ON true
        |ORDER BY c.event_id""".stripMargin,
    "q72_grouping_sets" ->
      """SELECT event_type AS metric, CAST(user_id % 4 AS INT) AS source_bucket,
        |  count(*) AS n, round(sum(value), 2) AS value_sum,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 4) AS INT) AS gid
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 4), ())
        |ORDER BY gid, metric, source_bucket""".stripMargin
  )
}

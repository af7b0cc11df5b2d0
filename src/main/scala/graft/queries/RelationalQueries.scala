package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operator inventory over the TPC-H-ish tables —
  * exercises scan→filter→agg, multi-way joins with broadcast dimensions,
  * top-k, and ranking windows at benchmark scale.
  */
object RelationalQueries {

  /** Pricing summary (TPC-H Q1 shape): single-pass grouped aggregate;
    * partial aggregation map-side, one shuffle on the two group keys. */
  def aggPricingSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue rollup across the full join tree. The fact table shuffles on
    * join keys; `nation`/`region` (and `customer` at any realistic scale
    * ratio) are explicitly broadcast — no shuffle for the dimension sides. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("lineitem_count"))
      .orderBy(col("revenue").desc, col("nation"))

  /** Date-filtered pricing summary — the filter reaches the parquet scan
    * as PushedFilters (verified in PLANS.md), so partitions outside the
    * range never leave storage. */
  def aggPricingFiltered(lineitem: DataFrame, maxShipDate: String): DataFrame =
    aggPricingSummary(lineitem.filter(
      col("l_shipdate") <= lit(maxShipDate).cast("timestamp_ntz")))

  /** Shipping-priority pick list (TPC-H Q3 shape): segment-filtered
    * customers ⋈ their still-open orders ⋈ lineitems shipping after the
    * cutoff, per-order revenue, top `k`. Both date predicates and the
    * segment equality push to the parquet scans; the customer side
    * broadcasts (segment-filtered dimension); the per-order rollup
    * shuffles once on the join key; the top-k is TakeOrderedAndProject.
    *
    * Revenue is EXACT: prices quantize to integer cents and discounts to
    * integer basis-hundredths before the sum (cents × (100−pct) per row,
    * one integer rollup, /10⁴ at display) — the order-free discipline,
    * not a rounded double sum, so the top-k ranking can never flip on
    * engine summation order. */
  def topUnshippedOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, segment: String = "BUILDING",
      asOf: String = "1997-06-30", k: Int = 10): DataFrame = {
    val cut = lit(asOf).cast("timestamp_ntz")
    val revInt = sum(
      floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
    lineitem.filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(revInt.cast("double") / 10000.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(k)
  }

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly N orders, INCLUDING the zero-order cohort —
    * the left join that a naive GROUP BY silently drops. One outer join
    * keyed on custkey, a per-customer count, then a distribution rollup
    * over the (small) count domain. Pure integer arithmetic — exact by
    * construction. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Large-volume orders (TPC-H Q18 shape): orders whose total line
    * quantity exceeds `minQty`, with customer attribution and top-k.
    * The per-order quantity rollup shuffles the fact table once on its
    * natural key and the HAVING filter runs on the aggregate BEFORE any
    * join — at scale the survivor set is tiny (the quantity tail), so
    * the subsequent orders/customer joins see thousands of rows, not
    * billions; AQE is free to broadcast the shrunken side. Quantities
    * are integral by schema contract and quantize to BIGINT before the
    * sum, so the threshold comparison and the ranking are exact on both
    * engines. Top-k is TakeOrderedAndProject, never a global sort. */
  def largeVolumeOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, minQty: Long = 300L, k: Int = 20): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(k)

  /** Promotion revenue share (TPC-H Q14 shape): what fraction of the
    * window's discounted revenue came from PROMO-type parts. The date
    * range pushes to the lineitem scan; the part dimension broadcasts
    * (explicitly — at any realistic scale parts ≪ lineitems); both the
    * promo and total sums are the exact cents × (100−pct) integer
    * discipline folded map-side into ONE aggregate (a conditional sum,
    * not two passes). The share is the single display-boundary division
    * of two exact integers — identical operands give an identical IEEE
    * quotient on both engines — and `share_bp` carries the fully exact
    * integer basis-point floor alongside it. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
      from: String = "1997-01-01", until: String = "1998-01-01"): DataFrame = {
    val unit = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(until).cast("timestamp_ntz"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", unit).otherwise(lit(0L))).as("promo_units"),
        sum(unit).as("total_units"))
      .select(
        round(col("promo_units").cast("double") / 10000.0, 2).as("promo_revenue"),
        round(col("total_units").cast("double") / 10000.0, 2).as("total_revenue"),
        expr("(promo_units * CAST(10000 AS BIGINT)) div total_units").as("share_bp"))
  }

  /** Nation-pair trade volume (TPC-H Q7 shape): revenue flowing between
    * two named nations, by supplier→customer direction and ship year. The
    * distinct plan feature is the SAME dimension joined TWICE under
    * different roles (supplier's nation, customer's nation) — both
    * broadcast, both pre-filtered to the two nations of interest so each
    * dim join also acts as a fact filter (the lineitem rows that survive
    * are only those touching the pair, long before the group-by). Revenue
    * uses the exact integer unit recipe (cents × (100−disc_pct), summed as
    * DECIMAL(38,0) ↔ HUGEINT — overflow-proof at any corpus size); the
    * readable `revenue` column derives from ONE division of that exact sum.
    * Shape at 100 TB: fact scan → two broadcast hash joins and two keyed
    * shuffles (orders, customer) → 2×2×years-sized rollup. */
  def nationTradeVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val unit = (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
      .cast("decimal(38,0)")
    val pair = Seq(nationA, nationB)
    val suppNation = broadcast(nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val custNation = broadcast(nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .join(custNation, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(unit).as("volume_units"))
      .withColumn("revenue",
        round(col("volume_units").cast("double") / 10000.0, 2))
      // accumulate in DECIMAL(38,0); the EMITTED sum is LONG (the gate
      // boundary type every green twin uses — CAST(SUM AS BIGINT))
      .withColumn("volume_units", col("volume_units").cast("long"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Late-shipment priority census (TPC-H Q4 shape): orders in a date
    * window having AT LEAST ONE line shipped more than `graceDays` after
    * the order date, counted by priority. The distinct plan feature is the
    * correlated EXISTS realized as a LEFT SEMI join whose condition mixes
    * the equi key with a non-equi cross-table date predicate — the semi
    * join stays keyed on l_orderkey (one shuffle pair), the date
    * comparison rides along as the join residual, and the fact side never
    * duplicates orders no matter how many lines are late. */
  def latePriorityOrders(lineitem: DataFrame, orders: DataFrame,
      graceDays: Int = 60, from: String = "1995-01-01",
      until: String = "1998-01-01"): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp_ntz") &&
        col("o_orderdate") < lit(until).cast("timestamp_ntz"))
      .join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS"),
        "leftsemi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("late_orders"))
      .orderBy("o_orderpriority")

  /** Idle rich customers (TPC-H Q22 shape, keyed on nation instead of
    * the phone prefix this corpus lacks): customers whose balance beats
    * the mean POSITIVE balance yet placed no orders, rolled up per
    * nation. The global mean is a 1-row aggregate broadcast back as a
    * scalar (the only cross), the no-orders test is a left anti join on
    * the order key, and the nation dimension broadcasts. The
    * above-average comparison is EXACT: balances quantize to integer
    * cents and the mean never materializes — `bal·n > Σ` by integer
    * cross-multiplication, the same order-free trick the validator
    * family uses, so a half-ulp mean can never flip a membership. */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      nation: DataFrame): DataFrame = {
    val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
    val posStats = customer.filter(col("c_acctbal") > 0)
      .agg(sum(cents).as("pos_sum"), count(lit(1)).as("pos_n"))
    customer.withColumn("bal_cents", cents)
      .crossJoin(broadcast(posStats))
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("bal_cents")).cast("double") / 100.0, 2).as("totacctbal"))
      .orderBy(col("nation"))
  }

  /** Trailing-window spend per customer: for every order, the running
    * sum of that customer's spend over the preceding `days` days — a
    * RANGE frame over event time (value-based bounds, peers included),
    * not a ROWS frame, so same-day orders always count together
    * regardless of intra-day order. One shuffle on the partition key;
    * the frame is evaluated in a single sorted pass per customer with a
    * sliding two-pointer, O(n) per partition — no self-join against the
    * date range, which is the naive formulation's quadratic trap. Spend
    * quantizes to cents before the frame sum, and a RANGE frame's output
    * is order-free within peer groups by construction, so the gate
    * hashes exactly. Ordering key is epoch seconds on both engines. */
  def trailingSpend(orders: DataFrame, days: Int = 90): DataFrame = {
    // NTZ → epoch seconds via a UTC timestamp cast (session TZ is pinned
    // UTC by Tables.ensureConf; DuckDB's epoch() makes the same choice)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-days.toLong * 86400L, 0L)
    orders.withColumn("price_cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round((sum(col("price_cents")).over(w)).cast("double") / 100.0, 2)
          .as("trailing_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Customers with at least one high-value order — left semi join
    * (existence only, no row multiplication, build side streams). */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame,
      minTotal: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") >= minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Customers with no orders at all — left anti join (the set-difference
    * shape the reference uses for referential integrity, J2/O7). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Revenue per order priority through a SALTED fact⋈dimension join —
    * the [[graft.operators.Skew.saltedJoin]] replicated-salt shape wired
    * into a gated query: the result multiset is identical to the plain
    * equi-join (the oracle IS the plain SQL join), while a whale orderkey's
    * rows spread over `buckets` reducers. The remaining-gap tool for
    * shuffled joins AQE can't split.
    *
    * `whaleMinRows = 4` is deliberately low for the gate: lineitem carries
    * 1–7 rows per orderkey, so the whale census genuinely splits the keys
    * and BOTH the salted-whale and plain-tail paths are hash-gated (a
    * production threshold would be millions). */
  def saltedRevenueByPriority(lineitem: DataFrame, orders: DataFrame,
      buckets: Int = 8): DataFrame =
    graft.operators.Skew.saltedJoin(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        Seq("l_orderkey"), buckets, whaleMinRows = 4)
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("lineitem_count"))
      .orderBy("o_orderpriority")

  /** Revenue per order priority through CO-BUCKETED staged tables — the
    * storage-layout half of the 100 TB join strategy, wired into a gated
    * query: both sides stage ONCE via [[graft.sources.Bucketing]] bucketed
    * (and per-bucket sorted) on the join key, so the recurring fact⋈fact
    * join sort-merges with NO Exchange and no Sort below the join — bucket
    * i reads against bucket i straight off storage. The merge hint forces
    * the SMJ shape bucketing targets (a broadcast join at toy scale would
    * bypass the bucket layout and prove nothing); the only shuffle left in
    * the plan is the 5-group rollup above the join (PlanPinSpec pins
    * this). Oracle = the plain join SQL, identical to the salted variant's.
    *
    * Staging paths/table names are keyed by the source dir, so sf0.01 and
    * sf0.1 runs coexist and re-runs overwrite idempotently. */
  def bucketedRevenueByPriority(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    import graft.sources.{Bucketing, Tables}
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${sys.props("java.io.tmpdir")}/graft_bucketed/$tag"
    val liTable = s"graft_bkt_lineitem_$tag"
    val ordTable = s"graft_bkt_orders_$tag"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
      liTable, s"$root/lineitem", "l_orderkey", buckets)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
      ordTable, s"$root/orders", "l_orderkey", buckets)
    Bucketing.table(spark, liTable)
      .join(Bucketing.table(spark, ordTable).hint("merge"), "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("lineitem_count"))
      .orderBy("o_orderpriority")
  }

  /** Lineitem revenue for high-value orders through a BLOOM-PREFILTERED
    * semi join: the filtered dimension keys build a Bloom filter (one
    * aggregate job, ~10 bits/key at 1% fpp), and every fact row probes it
    * map-side BEFORE the shuffle — rows that cannot match never leave the
    * scan stage, so the semi join's shuffle volume tracks the SELECTED
    * fraction of the fact table instead of all of it. False positives pass
    * the probe but die in the real semi join above, so the result is
    * exactly the plain semi join (the oracle IS that SQL). This is the
    * explicit, composable form of Spark's runtime bloom-filter join
    * optimization — built once, reusable across queries, and the filter
    * side can be persisted with the dimension.
    *
    * Scale envelope: pays when |keys| ≪ |fact| (here ~4% of orders
    * against a 4×-larger lineitem); the filter is ~1.2 MB per million
    * keys at 1% fpp, broadcast once per executor. */
  def bloomFilteredRevenue(lineitem: DataFrame, orders: DataFrame,
      minTotal: Double): DataFrame = {
    // cache-then-count (the Dedup fill-cache-before-reuse convention): the
    // filtered dimension is read three times below (count, bloomFilter
    // aggregate, semi join) and must scan storage only once
    val keys = orders.filter(col("o_totalprice") >= minTotal)
      .select(col("o_orderkey")).cache()
    val nKeys = math.max(keys.count(), 1L)
    val probe = graft.functions.BloomExpressions.registerBloom(
      lineitem.sparkSession, keys.stat.bloomFilter("o_orderkey", nKeys, 0.01))
    lineitem
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .filter(call_function(probe, col("l_orderkey")))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("lineitem_count"))
      .orderBy("l_returnflag")
  }

  /** Top-k orders by value — plans as TakeOrderedAndProject (per-partition
    * heap + driver merge), never a global sort. */
  def topkOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Status × priority rollup — every grouping level (detail, per-status
    * subtotal, grand total) in ONE pass over the fact table: Spark's
    * Expand emits the grouping-set replicas map-side and the whole thing
    * stays a single keyed aggregate, where the hand-written equivalent
    * unions three scans. grouping_id disambiguates subtotal rows from
    * genuine NULL keys. */
  def ordersRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Explicit GROUPING SETS — the member of the grouping-analytics family
    * neither [[ordersRollup]] nor [[ordersCube]] can express: exactly the
    * two independent margins ((status), (priority)) from ONE scan — two
    * report dimensions without the detail level or grand total a rollup/
    * cube would force, i.e. the cheapest possible multi-margin pass. Same
    * single-Expand single-aggregate physical shape (one replica per
    * requested set, not per subset). */
  def ordersGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Full CUBE over (status, priority) — all four grouping levels
    * (detail, per-status, per-priority, grand total) in one pass; the same
    * single-Expand-single-aggregate shape as [[ordersRollup]], one extra
    * grouping-set replica per row. grouping_id disambiguates subtotal rows
    * from genuine NULL keys; ordering puts subtotals (NULL keys) first. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Columns profiled by [[profileColumns]]'s gated instance — shared with
    * the generated oracle so the two sides cannot drift. */
  val ProfiledOrderCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  /** Data profiling — the engine-side table summary (row count, null
    * count, distinct count per column) every ingestion pipeline runs
    * before trusting a new source. ONE pass: all per-column aggregates in
    * a single `agg` (the multi-distinct Expand replicates input rows
    * ×columns map-side — the standard exact shape; a 100 TB profile swaps
    * countDistinct for approx_count_distinct, same plan skeleton), then a
    * `stack` unpivot of the 1-row result — driver-side constant work. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    row.select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)"))
      .select("column_name", "n_rows", "n_nulls", "n_distinct")
      .orderBy("column_name")
  }

  /** Tier bands (lo inclusive, hi exclusive, label) and the bin width of
    * the banded-join rewrite — shared with the generated oracle. */
  val PriceTiers: Seq[(Int, Int, String)] =
    Seq((0, 150000, "low"), (150000, 350000, "mid"), (350000, 600000, "high"))
  val TierBinWidth: Int = 50000

  /** Banded dimension lookup (value BETWEEN lo AND hi → tier) rewritten as
    * an equi-join: each dimension band expands to its covering
    * `TierBinWidth` bins, facts compute their bin, and the join keys on
    * bin with the exact range predicate as a residual filter. The
    * expansion turns the non-equi lookup every optimizer nested-loops
    * into a hash join — here the 12-bin dimension broadcasts; with a
    * million-band dimension the same plan shuffles both sides keyed on
    * bin (the RangeJoin binning discipline applied to lookups). Bands
    * must not overlap (each fact lands in exactly one tier). */
  def tierLookupJoin(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val dim = PriceTiers.toDF("lo", "hi", "tier")
      .select(col("lo"), col("hi"), col("tier"),
        explode(sequence(expr(s"lo div $TierBinWidth"),
          expr(s"(hi - 1) div $TierBinWidth"))).as("bin"))
    orders.select(col("o_totalprice"),
        floor(col("o_totalprice") / TierBinWidth).cast("int").as("bin"))
      .join(broadcast(dim), Seq("bin"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("tier")
  }

  /** Market-basket co-occurrence with lift — the association-rule seed
    * (which parts sell together beyond chance). The pair space exists only
    * WITHIN each order: the self-join keys on l_orderkey, so candidate
    * volume is Σ_order basket² with baskets bounded by order size (≤ 13
    * here) — the RangeJoin/LSH "quadratic only inside the bucket"
    * discipline on the relational side. Supports aggregate keyed on the
    * pair; item frequencies ride back as joins (AQE broadcasts the
    * frequency side); lift = support·n_orders/(cnt_a·cnt_b) as one double
    * division of exact integers, rounded. */
  /** The co-purchase support census every basket/graph gate shares: the
    * UNFILTERED (part_a, part_b, support) table from the distinct
    * (order, part) self-join — the expensive core that basket_pairs
    * (support ≥ 3), graph_triangles (via basket_pairs), and
    * graph_link_prediction (support ≥ 2) each recomputed per call. */
  def coPurchaseSupport(lineitem: DataFrame): DataFrame = {
    val items = graft.RunHygiene.stage(
      lineitem.select(col("l_orderkey"), col("l_partkey")).distinct())
    items.count() // both self-join sides read it
    items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
  }

  def basketPairs(lineitem: DataFrame, minSupport: Int = 3): DataFrame =
    basketPairsFrom(lineitem, coPurchaseSupport(lineitem), minSupport)

  /** [[basketPairs]] over an ALREADY-COMPUTED support census (the session
    * shares one [[coPurchaseSupport]] across the three consumer gates). */
  def basketPairsFrom(lineitem: DataFrame, support: DataFrame,
      minSupport: Int = 3): DataFrame = {
    val items = graft.RunHygiene.stage(
      lineitem.select(col("l_orderkey"), col("l_partkey")).distinct())
    items.count() // read by the frequency census and the order count
    val nOrders = broadcast(items.agg(countDistinct(col("l_orderkey")).as("n_orders")))
    val freq = items.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    support
      .filter(col("support") >= minSupport)
      .join(freq.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a")), Seq("part_a"))
      .join(freq.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b")), Seq("part_b"))
      .crossJoin(nOrders)
      .withColumn("lift", round(col("support").cast("double") * col("n_orders") /
        (col("cnt_a") * col("cnt_b")), 4))
      .select("part_a", "part_b", "support", "cnt_a", "cnt_b", "lift")
      .orderBy("part_a", "part_b")
  }

  /** The star schema's declared FK edges: (child, childKey, parent,
    * parentKey). Shared by the Spark profile and its oracle so the
    * relation list cannot drift. */
  val FkRelations: Seq[(String, String, String, String)] = Seq(
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"))

  /** Referential-integrity profile across the whole star schema in one
    * result: for each declared FK relation, the child row count, rows with
    * a NULL key (not violations), and true orphans (non-null key with no
    * parent). The every-morning data-quality sweep, as one union of
    * per-relation left-join rollups — each relation is a keyed join whose
    * parent side is the dimension (AQE broadcasts the small ones; the
    * lineitem→orders edge shuffles both sides keyed at 100 TB, exactly as
    * a join that size must). A 1-row aggregate per relation unions into
    * the |relations|-row report — driver state is the relation LIST, never
    * data. NULL keys never enter the join (they cannot match, and hashed
    * together they'd pile a null-heavy child onto one partition — the
    * null-skew trap); they're counted by a narrow filter+count branch and
    * crossed back as a 1-row frame. */
  def fkOrphanProfile(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations.map { case (name, child, ck, parent, pk) =>
      val c = child.select(col(ck).as("k"))
      val p = parent.select(col(pk).as("k")).distinct()
        .withColumn("hit", lit(1))
      val nulls = c.filter(col("k").isNull)
        .agg(count(lit(1)).as("n_null_keys"))
      c.filter(col("k").isNotNull)
        .join(p, Seq("k"), "left")
        .agg(count(lit(1)).as("n_nonnull"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .crossJoin(broadcast(nulls))
        .select(lit(name).as("relation"),
          (col("n_nonnull") + col("n_null_keys")).as("n_child_rows"),
          col("n_null_keys"), col("n_orphans"))
    }.reduce(_ unionByName _).orderBy("relation")

  /** Triangle census of the co-purchase graph — the cohesion summary
    * (nodes, edges, wedges, triangles, global clustering coefficient) of
    * the `basketPairs` network. Triangles enumerate as the oriented
    * two-path join e(a,b)⋈e(b,c)⋈e(a,c) over a<b edges — each triangle
    * counted exactly once, candidate volume bounded by Σ_b deg²(b) on an
    * already-thresholded edge set (support ≥ minSupport prunes hub
    * parts before any join). Wedges are Σ_v C(deg_v, 2) — pure integer
    * aggregate; the clustering coefficient reads out as integer basis
    * points (3·T·10⁴ div W), the engine's exact-ratio idiom, with a
    * wedge-free graph nulling out identically on both engines. */
  def basketTriangles(lineitem: DataFrame, minSupport: Int = 3): DataFrame =
    basketTrianglesFrom(basketPairs(lineitem, minSupport))

  /** [[basketTriangles]] over an already-computed [[basketPairs]] frame. */
  def basketTrianglesFrom(pairs: DataFrame): DataFrame = {
    val edges = graft.RunHygiene.stage(
      pairs.select(col("part_a").as("a"), col("part_b").as("b")))
    edges.count() // read by degree census and three triangle-join branches
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val nodesWedges = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"), col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    nEdges.crossJoin(nodesWedges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN NULL ELSE (3 * n_triangles * 10000) div n_wedges END")
          .as("clustering_bp"))
  }

  /** Top-3 orders per customer via ranking window — one shuffle on
    * o_custkey; AQE handles skewed customers. */
  def customerOrderRank(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("o_custkey", "rnk")
  }

  /** 2-D Pareto frontier (skyline) of orders maximizing (price, recency) —
    * "the big recent orders no other order beats on both axes", the
    * multi-objective shortlist operator (Börzsönyi et al., ICDE 2001).
    * Dominance is defined on integer cents and calendar days, so both
    * engines compare identical integers. A point survives iff no point has
    * ≥ on both axes with > on at least one; exact duplicates on both axes
    * survive together (neither dominates).
    *
    * Shape — the sort-based skyline as two window passes, never a self
    * join: for each row, the max date over STRICTLY higher prices (a
    * range frame on the cents ordering) and the max date among equal
    * prices decide survival. Pass 1 runs per hash bucket (keyed shuffle,
    * parallel) and discards ~all rows — a bucket-local non-skyline point
    * is dominated globally too, so pruning is lossless; pass 2 runs the
    * same windows globally over the few survivors (2-D skylines of random
    * data are O(log n)-sized; the global window sees bucket-frontier
    * unions, not the corpus). */
  def paretoFrontier(orders: DataFrame, buckets: Int = 32): DataFrame = {
    val pts = orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderdate"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("date_days"),
      pmod(col("o_orderkey"), lit(buckets)).as("bucket"))
    def frontier(df: DataFrame, local: Boolean): DataFrame = {
      val part = if (local) Seq(col("bucket")) else Seq.empty[org.apache.spark.sql.Column]
      // Descending order with a growing frame: Spark evaluates
      // [unboundedPreceding, -1] incrementally (one aggregate update per
      // row), whereas the mirror-image ascending [1, unboundedFollowing]
      // frame recomputes the aggregate from scratch per row — O(n^2) per
      // partition. Same frame contents: rows with strictly higher cents.
      val wStrict = Window.partitionBy(part: _*).orderBy(col("price_cents").desc)
        .rangeBetween(Window.unboundedPreceding, -1L)
      val wTie = Window.partitionBy(part :+ col("price_cents"): _*)
      df.withColumn("d_above", max(col("date_days")).over(wStrict))
        .withColumn("d_tie", max(col("date_days")).over(wTie))
        .filter((col("d_above").isNull || col("d_above") < col("date_days")) &&
          col("date_days") === col("d_tie"))
        .drop("d_above", "d_tie")
    }
    frontier(frontier(pts, local = true), local = false)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  /** Year-over-year revenue growth per nation — the trend readout a
    * revenue dashboard layers over [[revenueByNation]]'s level rollup.
    *
    * Revenue is exact integer cents (per-row ROUND then BIGINT sum — the
    * balance-equation discipline, immune to float association); growth is
    * sign-split integer basis points ((rev − prev)·10000 div prev with
    * the dailyCusum sign/abs form, so truncation direction cannot differ
    * across engines on a down year). First observed year is NULL.
    *
    * Shape: fact shuffles once on the join keys, nation broadcasts, the
    * (nation, year) rollup combines map-side, and the lag window runs
    * over nations × years — a calendar-bounded frame at any fact volume. */
  def yoyRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val base = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rev_cents"))
    val w = Window.partitionBy("nation").orderBy("yr")
    base.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .withColumn("yoy_bp",
        when(col("prev_cents").isNull, lit(null).cast("long"))
          .otherwise((signum(col("rev_cents") - col("prev_cents")) *
            expr("abs(rev_cents - prev_cents) * 10000 div prev_cents")).cast("long")))
      .select("nation", "yr", "rev_cents", "prev_cents", "yoy_bp")
      .orderBy("nation", "yr")
  }

  /** Returned-item reporting (TPC-H Q10 shape): customers who returned
    * goods in one quarter, ranked by lost revenue, top `k`. The quarter
    * predicate pushes to the orders scan and the R-flag equality to the
    * lineitem scan BEFORE the join, so the join sees one quarter × one
    * flag of the fact side; nation broadcasts; the per-customer rollup
    * shuffles once on custkey. Revenue is the exact cents × (100−pct)
    * integer discipline, so the top-k set and order cannot flip on
    * summation order; ties break on c_custkey. At 100 TB the quarter
    * filter is the partition-pruning dimension (orders parquet
    * hive-partitioned by month prunes ~96% of the scan — the
    * sink_partitioned_scan gate demonstrates exactly that layout). */
  def returnedItemCustomers(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      from: String = "1997-01-01", until: String = "1997-04-01",
      k: Int = 20): DataFrame = {
    val unit = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp_ntz") &&
          col("o_orderdate") < lit(until).cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
      .agg(round(sum(unit).cast("double") / 10000.0, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Top-revenue supplier (TPC-H Q15 shape): per-supplier revenue over a
    * shipping quarter, then the supplier(s) achieving the global maximum —
    * the classic view + scalar-subquery-equality. The quarter pushes to
    * the scan; the rollup shuffles once on suppkey; the max is a 1-row
    * broadcast crossed back against the rollup (no second scan of the
    * fact). Revenue stays an exact integer inside BOTH the rollup and the
    * max-equality comparison — the display division happens only after
    * the equality — so "the max" is a well-defined integer on both
    * engines and ties (multiple suppliers at the max) all surface,
    * ordered by suppkey. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      from: String = "1997-01-01", until: String = "1997-04-01"): DataFrame = {
    val unit = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(until).cast("timestamp_ntz"))
      .groupBy(col("l_suppkey")).agg(sum(unit).as("rev_unit"))
    val best = broadcast(rev.agg(max(col("rev_unit")).as("best_unit")))
    rev.crossJoin(best).filter(col("rev_unit") === col("best_unit"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_unit").cast("double") / 10000.0, 2).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Small-quantity-order revenue (TPC-H Q17 shape): lines of one brand
    * whose quantity falls below 20% of that part's average line quantity —
    * the correlated-scalar-per-group shape. The per-part average is NEVER
    * a double: the membership test `qty < 0.2 · (sum/n)` is the integer
    * cross-multiplication `qty · 5 · n < sum` (quantities integral by
    * schema contract, quantized to BIGINT), so it is exact on both
    * engines. The brand predicate prunes FIRST via a broadcast semi-join
    * — the per-part census runs over only the brand's lines, not the
    * catalog — and the census joins back on partkey (one keyed shuffle
    * pair at scale; AQE broadcasts the census side, which is bounded by
    * the brand's part count). Output is the single yearly-average row:
    * exact integer cents / 100 / 7, display divisions only. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#23"): DataFrame = {
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val qty = floor(col("l_quantity") + 0.5).cast("long")
    val brandLines = lineitem.join(
      broadcast(part.filter(col("p_brand") === brand).select("p_partkey")),
      col("l_partkey") === col("p_partkey"), "left_semi")
    val census = brandLines.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_lines"))
    brandLines.join(census, col("l_partkey") === col("t_partkey"))
      .filter(qty * lit(5L) * col("n_lines") < col("sum_qty"))
      .agg(round((sum(cents).cast("double") / 100.0) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("qualifying_lines"))
  }

  /** Disjunctive-predicate revenue (TPC-H Q19 shape): an OR of three
    * (brand, size-range, quantity-range) conjunctions across the
    * part ⋈ lineitem join — the shape that punishes engines that cannot
    * factor disjunctions. The brand IN-list (the union of the branches'
    * brand terms) prunes the broadcast dimension to three brands BEFORE
    * the join, so the fact side probes a tiny hash relation; the residual
    * OR evaluates post-join inside whole-stage codegen. Output: one
    * exact-revenue row plus per-branch line counts, so the gate pins each
    * disjunct, not just their union. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val unit = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    val qty = floor(col("l_quantity") + 0.5).cast("long")
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      qty.between(1L, 11L)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      qty.between(10L, 20L)
    val b3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
      qty.between(20L, 30L)
    lineitem.join(
        broadcast(part.filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))),
        col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(round(sum(unit).cast("double") / 10000.0, 2).as("revenue"),
        sum(when(b1, 1L).otherwise(0L)).as("branch1_lines"),
        sum(when(b2, 1L).otherwise(0L)).as("branch2_lines"),
        sum(when(b3, 1L).otherwise(0L)).as("branch3_lines"))
  }

  /** National market share (TPC-H Q8 shape): within one customer region
    * and one part type, the share of yearly revenue supplied by one
    * nation. The nation dimension appears TWICE (customer's region
    * membership, supplier's identity) — both broadcast; the part-type
    * filter prunes the broadcast part dim BEFORE the join so the fact
    * probes only the type's parts. The share is a conditional integer
    * rollup inside ONE aggregate (never two passes), and `share_bp` is
    * the exact integer basis-point floor — the displayed doubles derive
    * from single divisions of exact integers. At 100 TB: fact scan → 3
    * broadcast joins + 1 keyed orders join → years-sized rollup. */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame, part: DataFrame,
      custRegion: String = "EUROPE", partType: String = "PROMO",
      suppNation: String = "NATION_3"): DataFrame = {
    val unit = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    val custInRegion = customer
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === custRegion)),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select("c_custkey")
    val suppNat = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    lineitem
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(custInRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(
        sum(when(col("supp_nation") === suppNation, unit).otherwise(lit(0L)))
          .as("nation_units"),
        sum(unit).as("total_units"))
      .select(col("yr"),
        round(col("nation_units").cast("double") / 10000.0, 2).as("nation_revenue"),
        round(col("total_units").cast("double") / 10000.0, 2).as("total_revenue"),
        expr("(nation_units * CAST(10000 AS BIGINT)) div total_units").as("share_bp"))
      .orderBy("yr")
  }

  /** Product-line profit (TPC-H Q9 shape): per supplier nation and order
    * year, revenue minus cost for parts whose name matches a token. Cost
    * substitutes the part's retail price × quantity for the reference
    * schema's supplycost (no partsupp table in this corpus) — the shape
    * (fact ⋈ name-filtered part ⋈ supplier-nation, profit expression
    * inside the rollup) is identical. Profit is reported as the exact
    * integer at the shared 10⁻⁴ scale: cents×(100−pct) −
    * retail_cents×100×qty — never a rounded double, because signed
    * profit sums (unlike the positive revenue rollups) routinely land on
    * .xx5 display boundaries where Spark's decimal-string HALF_UP and
    * DuckDB's binary-double rounding disagree by one cent. The name
    * filter prunes the broadcast part dim before the join; orders joins
    * keyed for the year. */
  def nationProfit(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
      nation: DataFrame, part: DataFrame, nameToken: String = "widget"): DataFrame = {
    val revenue = floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))
    val cost = floor(col("p_retailprice") * 100 + 0.5).cast("long") * lit(100L) *
      floor(col("l_quantity") + 0.5).cast("long")
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(revenue - cost).as("profit_units"))
      .select(col("nation"), col("yr"), col("profit_units"))
      .orderBy(col("nation"), col("yr").desc)
  }

  /** Supplier value concentration (TPC-H Q11 shape): suppliers whose
    * shipped-value share exceeds 1.05× the mean share — the GROUP BY +
    * HAVING-against-a-scalar-subquery shape. The threshold comparison is
    * the integer cross-multiplication `value · n · 20 > 21 · total`
    * (never a double fraction), with the per-supplier rollup computed
    * ONCE and staged: the global total and supplier count derive from the
    * rollup itself (domain-sized), so the fact scans once. Output is the
    * concentration tail ordered by exact value. A corpus-relative
    * threshold expresses the TPC-H form's 0.0001/SF intent; 1.05× is
    * calibrated to this corpus's near-uniform supplier distribution
    * (max share ≈ 1.07–1.12× mean) so the tail is non-trivial at every
    * scale — ~10-16% of suppliers — rather than empty. */
  def supplierValueConcentration(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rollup = graft.RunHygiene.stage(
      lineitem.groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("value_cents")))
    val totals = broadcast(rollup.agg(
      sum(col("value_cents")).as("total_cents"),
      count(lit(1)).as("n_suppliers")))
    rollup.crossJoin(totals)
      .filter(col("value_cents") * col("n_suppliers") * lit(20L) >
        col("total_cents") * lit(21L))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("value_cents"),
        expr("(value_cents * CAST(10000 AS BIGINT)) div total_cents").as("share_bp"))
      .orderBy(col("value_cents").desc, col("s_suppkey"))
  }

  /** Supplier variety census (TPC-H Q16 shape): how many distinct
    * suppliers ship each (brand, type, size) combination, EXCLUDING a
    * disqualified supplier set — the NOT-IN + COUNT DISTINCT shape. The
    * exclusion (suppliers with below-mean account balance, the corpus's
    * stand-in for the reference's complaint filter) is an anti-join
    * against a broadcast subquery whose threshold is the integer
    * cross-multiplication `acctbal_cents · n < sum_cents`; sizes restrict
    * to an IN-list so the census domain is bounded. One distinct-agg
    * shuffle on the composite key; part broadcasts. */
  def supplierVariety(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      sizes: Seq[Int] = Seq(1, 9, 14, 19, 23, 36, 45, 49)): DataFrame = {
    val balCents = floor(col("s_acctbal") * 100 + 0.5).cast("long")
    val stats = broadcast(supplier.agg(
      sum(balCents).as("sum_cents"), count(lit(1)).as("n_supp")))
    val disqualified = supplier.crossJoin(stats)
      .filter(balCents * col("n_supp") < col("sum_cents"))
      .select(col("s_suppkey").as("bad_suppkey"))
    lineitem
      .join(broadcast(part.filter(col("p_size").isin(sizes.map(Integer.valueOf): _*))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(disqualified), col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Surge suppliers (TPC-H Q20 shape): suppliers for whom some part
    * shipped MORE in one year than in all other years combined — the
    * nested-aggregate semi-join chain (per-(supplier, part) census →
    * threshold → DISTINCT suppliers → dimension join). The year test is
    * exact integers: `qty_year · 2 > qty_total` with quantities quantized
    * to BIGINT. The census shuffles the fact once on the composite key;
    * everything after is domain-sized. */
  def surgeSuppliers(lineitem: DataFrame, supplier: DataFrame,
      yr: Int = 1997): DataFrame = {
    val qty = floor(col("l_quantity") + 0.5).cast("long")
    lineitem.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(qty).as("qty_total"),
        sum(when(year(col("l_shipdate")) === yr, qty).otherwise(lit(0L))).as("qty_year"))
      .filter(col("qty_year") * lit(2L) > col("qty_total"))
      .select("l_suppkey").distinct()
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** Forecast-revenue scalar (TPC-H Q6 shape): one filtered full-scan
    * aggregate with NO join and NO group — the pushdown microbenchmark.
    * All three predicates (ship-date window, discount band, quantity cap)
    * reach the parquet scan as PushedFilters, so at 100 TB the scan reads
    * only row groups whose column statistics intersect the window; the
    * aggregate is a single map-side-combinable partial sum. The discount
    * band compares integer basis-hundredths (floor(disc·100+0.5) ∈
    * [5,7]) and revenue = Σ cents·pct is the exact integer at the 10⁻⁴
    * scale, reported alongside the single display division. */
  def revenueScalar(lineitem: DataFrame, from: String = "1997-01-01",
      until: String = "1998-01-01", minPct: Int = 5, maxPct: Int = 7,
      maxQty: Int = 24): DataFrame = {
    val pct = floor(col("l_discount") * 100 + 0.5).cast("long")
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val qty = floor(col("l_quantity") + 0.5).cast("long")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(until).cast("timestamp_ntz") &&
        pct.between(minPct.toLong, maxPct.toLong) && qty < maxQty.toLong)
      .agg(sum(cents * pct).as("revenue_units"),
        count(lit(1)).as("qualifying_lines"))
      .select(col("revenue_units"),
        round(col("revenue_units").cast("double") / 10000.0, 2).as("revenue"),
        col("qualifying_lines"))
  }

  /** Global spend quartiles — the distributed form: instead of a global
    * NTILE window (which forces a single-partition total order — the one
    * shape that canNOT scale), quartile boundaries come from ONE
    * `percentile` aggregate over exact integer cents (Spark's linear
    * interpolation matches DuckDB's quantile_cont on integer inputs — a
    * proven cross-engine contract in this repo), broadcast as a 1-row
    * frame, and membership is a codegen'd conditional — the whole query
    * is two corpus scans with no shuffle wider than the 4-row rollup.
    * Boundary rows tie into the lower bucket on both engines (`<=`). */
  def spendQuartiles(orders: DataFrame): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val o = graft.RunHygiene.stage(orders.select(cents.as("cents")))
    val bounds = broadcast(o.agg(
      expr("percentile(cents, 0.25)").as("q1"),
      expr("percentile(cents, 0.5)").as("q2"),
      expr("percentile(cents, 0.75)").as("q3")))
    o.crossJoin(bounds)
      .withColumn("quartile",
        when(col("cents") <= col("q1"), 1L)
          .when(col("cents") <= col("q2"), 2L)
          .when(col("cents") <= col("q3"), 3L)
          .otherwise(4L))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy("quartile")
  }

  /** Per-customer spend quartiles via NTILE — the window form that IS
    * scale-correct, because the partition key (custkey) distributes: each
    * customer's orders rank within their own partition (deterministic
    * (cents, orderkey) order), NTILE(4) splits them with the standard
    * ceil-then-floor bucket sizing both engines share, and the rollup
    * reads per-(bucket) totals. Integer cents end-to-end. */
  def customerSpendQuartiles(orders: DataFrame): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val w = Window.partitionBy("o_custkey").orderBy(col("cents"), col("o_orderkey"))
    orders.select(col("o_custkey"), col("o_orderkey"), cents.as("cents"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .orderBy("quartile")
  }

  /** Cheapest-line supplier per part (TPC-H Q2 shape): for each part of
    * one size, the supplier(s) that recorded the minimum line price —
    * the correlated-min-subquery-then-rejoin shape, realized as a
    * per-part min-rank window (rn = 1 with suppkey tie-break) so the
    * fact scans once instead of twice. Prices compare as exact integer
    * cents, so "the minimum" and its ties are engine-independent; the
    * size filter prunes the broadcast part dim before the join. Output
    * is per-part (one row per part, deterministic tie-break), bounded by
    * the size's part count — the same output discipline as the
    * reference query's TOP 100. */
  def minPriceSupplier(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, size: Int = 15): DataFrame = {
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val w = Window.partitionBy("l_partkey")
      .orderBy(col("line_cents"), col("l_suppkey"))
    lineitem
      .join(broadcast(part.filter(col("p_size") === size).select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("l_suppkey"), cents.as("line_cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"),
        col("s_name"), col("n_name").as("nation"), col("line_cents").as("min_cents"))
      .orderBy("p_partkey")
  }

  /** Local-supplier volume (TPC-H Q5 shape): revenue per nation within one
    * customer region and order-date window, counting ONLY lines where the
    * supplier sits in the customer's own nation — the six-table join whose
    * distinguishing feature is the non-key equality `c_nationkey =
    * s_nationkey` folded INTO the supplier join condition rather than a
    * post-join filter, so mismatched pairs never materialize. nation and
    * region broadcast pre-filtered to the region (each dim join doubles as
    * a fact filter); the date window pushes to the orders scan. Revenue is
    * the exact cents × (100−pct) integer unit summed as DECIMAL(38,0) —
    * the ordering key `volume_units` can never flip on summation order;
    * the readable `revenue` is one display division. At 100 TB: fact scan
    * → two keyed shuffles (orders, customer) + three broadcast joins →
    * nations-sized rollup. */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String = "EUROPE",
      from: String = "1995-01-01", until: String = "1999-01-01"): DataFrame = {
    val unit = (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long")))
      .cast("decimal(38,0)")
    val regionNations = broadcast(nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit(from).cast("timestamp_ntz") &&
        col("o_orderdate") < lit(until).cast("timestamp_ntz")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(regionNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"), sum(unit).as("volume_units"))
      .withColumn("revenue",
        round(col("volume_units").cast("double") / 10000.0, 2))
      // DECIMAL(38,0) accumulation, LONG at the gate boundary
      .withColumn("volume_units", col("volume_units").cast("long"))
      .orderBy(col("volume_units").desc, col("nation"))
  }

  /** Late-line priority census by line status (TPC-H Q12 shape, adapted:
    * this corpus has no l_shipmode/receiptdate, so the "mode" axis is
    * l_linestatus and "late" is shipdate > orderdate + grace — the same
    * adaptation the Q4/Q21 shapes use). The signature plan feature is the
    * conditional split INSIDE the aggregate: one join, one rollup, and the
    * high/low priority classification as two codegen'd conditional counts
    * — never two passes or a pivot join. The ship-date window pushes to
    * the fact scan; the non-equi lateness predicate rides the keyed join
    * as a residual. Pure integer counts — exact by construction. */
  def lateLinePriorityCensus(lineitem: DataFrame, orders: DataFrame,
      graceDays: Int = 60, from: String = "1996-01-01",
      until: String = "1998-01-01"): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(until).cast("timestamp_ntz"))
      .join(orders,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** UNPIVOT surface (`Dataset.unpivot`, the melt/stack operator): the
    * per-priority digest's metric COLUMNS rotated into (metric, value)
    * ROWS — the long-form reshape every BI export and metrics warehouse
    * ingests. Spark plans unpivot as an Expand (each input row emits one
    * row per value column, no shuffle, no join); the rollup before it is
    * one map-side-combinable aggregate, so the whole query is scan →
    * aggregate → expand. All values are exact integers widened to one
    * shared LONG type (unpivot requires a common value type — the same
    * contract SQL's UNION ALL twin makes explicit). */
  def ordersUnpivot(orders: DataFrame): DataFrame = {
    val digest = orders.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n_orders"),
      sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents_sum"),
      countDistinct(col("o_custkey")).as("n_custs"))
    digest.unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_orders"), col("cents_sum"), col("n_custs")),
        "metric", "value")
      .orderBy("o_orderpriority", "metric")
  }

  /** percent_rank / cume_dist surface: each order's standing within its
    * priority class by exact spend cents. Both statistics are single
    * divisions of engine-identical integers once the ORDER BY is made
    * total — (cents, orderkey) has no ties, so cume_dist degenerates to
    * row_number/n and percent_rank to (row_number−1)/(n−1) on BOTH
    * engines, the property that makes the doubles bit-identical. The
    * `mod`-sampled readout bounds output to ~1/mod of the corpus while
    * still exercising every partition's full window. One keyed exchange;
    * the sample predicate runs after ranking (it must — ranks are over
    * the whole class). */
  def orderPercentiles(orders: DataFrame, mod: Int = 97): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val w = Window.partitionBy("o_orderpriority").orderBy(col("cents"), col("o_orderkey"))
    orders.select(col("o_orderkey"), col("o_orderpriority"), cents.as("cents"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .filter(pmod(col("o_orderkey"), lit(mod)) === 0)
      .orderBy("o_orderkey")
  }

  /** Suppliers who kept orders waiting (TPC-H Q21 shape, same lateness
    * adaptation as Q4/Q12): on finished multi-supplier orders, the
    * supplier whose line was the ONLY late one. The textbook form is a
    * correlated EXISTS (another supplier touched the order) plus NOT
    * EXISTS (another supplier was late) — two extra scans of the largest
    * table. Here both collapse into ONE keyed rollup: per order, count
    * distinct suppliers, count distinct LATE suppliers, and carry the
    * late supplier's key; `n_supp > 1 ∧ n_late = 1` is exactly the
    * exists/not-exists pair, decided with one shuffle of the fact table
    * instead of three. The per-supplier census joins the (tiny) survivor
    * set to the broadcast supplier dim. Counts are integers; the output
    * ranks by waiting count with a name tie-break — exact end-to-end. */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, graceDays: Int = 60): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS")
    lineitem
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late"),
        max(when(late, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy("late_supp")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }
}

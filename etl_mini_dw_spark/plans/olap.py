"""OLAP operators beyond the reference's surface (Spark-first completeness).

The reference uses no grouping sets / pivot / quantiles / native session
windows (SURVEY §2.5 "not present") — but a user switching to this engine
gets them as first-class, oracle-checked operators. All exact-decimal /
count-based (pivot, rollup) or deterministically rounded (quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median/p90 per event type.

    Exact ``percentile`` needs a per-group sort — fine for bounded group
    counts; at 100 TB switch to ``percentile_approx`` (t-digest, partial-
    aggregable) when ±ε is acceptable.
    """
    ev = typed_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).alias("p90_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS median_value,
       round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def events_pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type (explicit
    value list keeps the schema static — required at scale anyway)."""
    ev = typed_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # Spark's pivot leaves NULL in a (day, type) cell with zero events;
    # the oracle's COUNT(*) FILTER yields 0 — coalesce so both engines
    # agree regardless of data density.
    return wide.select(
        "day", *[F.coalesce(F.col(t), F.lit(0).cast("long")).alias(t) for t in EVENT_TYPES]
    )


EVENTS_PIVOT_SQL = (
    "SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\"" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY 1"
)


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping id — subtotal
    levels computed in one pass (partial-aggregable at any scale)."""
    li = typed_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("decimal(38,2)").cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("gid"),
    )


SALES_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INTEGER) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data filter: keep docs whose quality score
    clears a threshold AND whose heuristic language agrees with the
    label; report keep/drop counts per source (the composition every
    corpus pipeline runs before tokenization)."""
    from etl_mini_dw_spark.functions.text import lang_id, text_stats
    from etl_mini_dw_spark.sources.tables import load_table

    stats = text_stats(spark, sf_dir).select("doc_id", "quality_score")
    langs = lang_id(spark, sf_dir).select("doc_id", "lang_label", "lang_pred")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    keep = (F.col("quality_score") >= 0.5) & (F.col("lang_pred") == F.col("lang_label"))
    return (
        docs.join(stats, "doc_id")
        .join(langs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
        )
    )


CORPUS_QUALITY_SQL = """
WITH stats AS (
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS BIGINT) AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
         AS n_punct,
       round(least(1.0, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS DOUBLE) / 50.0)
             * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                           AS DOUBLE) / CAST(length(text) AS DOUBLE)), 6) AS quality_score
FROM documents
),
langs AS (
    WITH hits AS (
      SELECT doc_id, lang AS lang_label, CAST(len(list_filter(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'), t -> lower(t)), t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) AS hits_en, CAST(len(list_filter(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'), t -> lower(t)), t -> t IN ('le', 'la', 'et', 'de', 'un'))) AS BIGINT) AS hits_fr, CAST(len(list_filter(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'), t -> lower(t)), t -> t IN ('el', 'los', 'y', 'de', 'un'))) AS BIGINT) AS hits_es, CAST(len(list_filter(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'), t -> lower(t)), t -> t IN ('der', 'die', 'und', 'das', 'ein'))) AS BIGINT) AS hits_de, CAST(len(list_filter(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'), t -> lower(t)), t -> t IN ('de', 'shi', 'le', 'zai', 'he'))) AS BIGINT) AS hits_zh
      FROM documents
    )
    SELECT doc_id, lang_label, hits_de, hits_en, hits_es, hits_fr, hits_zh,
           CASE WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'de' WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'en' WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'es' WHEN hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'fr' WHEN hits_zh = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'zh' END AS lang_pred
    FROM hits
    )
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN s.quality_score >= 0.5 AND l.lang_pred = l.lang_label
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d
JOIN stats s ON s.doc_id = d.doc_id
JOIN langs l ON l.doc_id = d.doc_id
GROUP BY d.source
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a JSON field from
    ``events.props`` (JVM-side ``get_json_object``, no UDF) and aggregate
    it — the schema-on-read path every event pipeline needs."""
    ev = typed_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct set operators (INTERSECT / EXCEPT) the reference never
    uses: nations having customers in BUILDING but not in MACHINERY
    segments, and the intersection count."""
    cust = typed_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    # subtract = EXCEPT DISTINCT (set semantics; exceptAll would be bag)
    only_building = building.distinct().subtract(machinery).withColumn(
        "set_op", F.lit("building_minus_machinery")
    )
    both = building.intersect(machinery).withColumn("set_op", F.lit("intersection"))
    return only_building.unionByName(both).select(
        "set_op", F.col("c_nationkey").cast("int").alias("nationkey")
    )


SEGMENT_SET_OPS_SQL = """
SELECT 'building_minus_machinery' AS set_op, CAST(n AS INTEGER) AS nationkey FROM (
  SELECT DISTINCT c_nationkey AS n FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
UNION ALL
SELECT 'intersection' AS set_op, CAST(n AS INTEGER) AS nationkey FROM (
  SELECT c_nationkey AS n FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
"""


def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) the daily per-type pivot back to long form —
    round-trips the pivot operator."""
    wide = events_pivot_type_by_day(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', `{t}`" for t in EVENT_TYPES)
    # zero-count cells (coalesced to 0 by the pivot) are dropped so the
    # long form matches the observed-combinations oracle on sparse data
    return wide.selectExpr(
        "day", f"stack({len(EVENT_TYPES)}, {stack_args}) AS (event_type, n_events)"
    ).filter(F.col("n_events") > 0)


EVENTS_UNPIVOT_SQL = """
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def order_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window battery per customer order history: lag / lead /
    rank / ntile / running total in ONE window pass.

    All five functions share a single ``partitionBy(custkey)`` sort, so
    the physical plan is one shuffle + one per-partition sort regardless
    of how many window expressions ride on it (WindowExec evaluates them
    together). Orderings are total (o_orderkey is the orders PK). The
    running total is exact DECIMAL, cast to DOUBLE at the very end.
    """
    from pyspark.sql import Window

    orders = typed_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    running = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total_dec = F.col("o_totalprice").cast("decimal(14,2)")
    # lag/lead at partition edges → −1 sentinel (prices are strictly
    # positive): NULL doubles round-trip as None on Spark but NaN through
    # DuckDB→pandas, which would break the value hash
    price_dbl = F.col("o_totalprice").cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.lag(price_dbl).over(seq), F.lit(-1.0)).alias("prev_total"),
        F.coalesce(F.lead(price_dbl).over(seq), F.lit(-1.0)).alias("next_total"),
        F.row_number().over(by_price).cast("int").alias("price_rank"),
        F.ntile(4).over(seq).cast("int").alias("recency_quartile"),
        F.sum(total_dec).over(running).cast("decimal(38,2)").cast("double").alias("running_spend"),
    )


ORDER_WINDOW_BATTERY_SQL = """
SELECT o_custkey, o_orderkey,
       COALESCE(lag(CAST(o_totalprice AS DOUBLE)) OVER seq, -1.0) AS prev_total,
       COALESCE(lead(CAST(o_totalprice AS DOUBLE)) OVER seq, -1.0) AS next_total,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank,
       CAST(ntile(4) OVER seq AS INTEGER) AS recency_quartile,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (order year, status): all four grouping levels in one
    pass — like ``sales_rollup`` but the full lattice. Partial-aggregable:
    Spark expands the grouping sets map-side and combines per level, so
    the shuffle carries one row per (level, group), never the input."""
    orders = typed_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
        )
        .cube("order_year", "status")
        .agg(
            F.sum("price").cast("decimal(38,2)").cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


ORDERS_CUBE_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderstatus AS status,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders,
       CAST(GROUPING(year(o_orderdate))*2 + GROUPING(o_orderstatus) AS INTEGER) AS gid
FROM orders GROUP BY CUBE (year(o_orderdate), o_orderstatus)
"""


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((year, priority), (year), ()) — the
    subtotal shape a reporting layer asks for when CUBE computes too
    much. Same one-pass partial-aggregable execution as cube/rollup."""
    orders = typed_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
        )
        .groupingSets(
            [["order_year", "priority"], ["order_year"], []],
            "order_year",
            "priority",
        )
        .agg(
            F.sum("price").cast("decimal(38,2)").cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


REVENUE_GROUPING_SETS_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders,
       CAST(GROUPING(year(o_orderdate))*2 + GROUPING(o_orderpriority) AS INTEGER) AS gid
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority), (year(o_orderdate)), ())
"""


BASKET_TOP = 20


def part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lite: the top co-occurring part pairs across orders.

    Self-join on l_orderkey with ``a < b`` — fan-out is bounded by
    (items-per-order choose 2), a per-order constant, never corpus-
    scale: the same per-container-pair-bound argument as LSH banding.
    Distinct parts per order first so multi-line items don't inflate
    pair counts. Top-20 via TakeOrderedAndProject (no global sort).
    """
    li = (
        typed_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


PART_COOCCURRENCE_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_TOP}
"""


# --- association rules over the basket pairs --------------------------------
RULES_MIN_PAIR_ORDERS = 2
RULES_TOP = 50


def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: support, directional
    confidence, and lift for every part pair co-occurring in ≥
    ``RULES_MIN_PAIR_ORDERS`` orders — the full market-basket deliverable
    on top of the co-occurrence counts.

    All three metrics are ratios of exact integers (pair orders, item
    orders, total orders), so the doubles are bit-identical across
    engines (IEEE division of identical integers); rounded to 6 anyway
    per the repo's ratio convention. Shape: the pair self-join is the
    Σ(basket²) bound as in co-occurrence; per-item order counts are a
    dim-sized aggregate broadcast back; the total-orders scalar is a
    1-row cross join. Top-``RULES_TOP`` by lift via
    TakeOrderedAndProject — no global sort.
    """
    li = (
        typed_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)  # pair join + item counts + N share one scan
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = li.alias("a"), li.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= RULES_MIN_PAIR_ORDERS)
    )
    scored = (
        pair_counts.join(
            F.broadcast(item.select(F.col("part").alias("part_a"), F.col("n_item").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(item.select(F.col("part").alias("part_b"), F.col("n_item").alias("n_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.round(F.col("n_pair") / F.col("n_total"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_pair") / F.col("n_b"), 6).alias("conf_b_to_a"),
            F.round(
                (F.col("n_pair") * F.col("n_total")) / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "part_a", "part_b").limit(RULES_TOP)


PART_ASSOCIATION_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total FROM li),
item AS (SELECT l_partkey AS part, COUNT(*) AS n_item FROM li GROUP BY 1),
pc AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {RULES_MIN_PAIR_ORDERS}
)
SELECT part_a, part_b, CAST(n_pair AS BIGINT) AS n_pair,
       round(CAST(n_pair AS DOUBLE) / n_total, 6) AS support,
       round(CAST(n_pair AS DOUBLE) / ia.n_item, 6) AS conf_a_to_b,
       round(CAST(n_pair AS DOUBLE) / ib.n_item, 6) AS conf_b_to_a,
       round(CAST(n_pair * n_total AS DOUBLE) / (ia.n_item * ib.n_item), 6) AS lift
FROM pc
JOIN item ia ON ia.part = pc.part_a
JOIN item ib ON ib.part = pc.part_b
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT {RULES_TOP}
"""


def props_schema_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: per event_type, the distinct
    sorted key-sets appearing in the ``props`` JSON column with their
    frequencies — the drift report that catches producers adding or
    dropping fields before a downstream extract breaks.

    Map-only key extraction (``from_json`` to a map, keys sorted for a
    canonical group key), then one partial-aggregable aggregate keyed by
    (type, key-set) — cardinality = distinct producer schemas, tiny at
    any corpus size.
    """
    ev = typed_table(spark, sf_dir, "events")
    # comma-joined STRING, not array<string>: compared output must stay
    # free of container types (driver canonicalizer contract,
    # tests/test_output_contract.py — the r4 token_postings failure class)
    keys = F.array_join(
        F.array_sort(F.map_keys(F.from_json("props", "map<string,string>"))), ","
    )
    return (
        ev.select("event_type", keys.alias("prop_keys"))
        .groupBy("event_type", "prop_keys")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


PROPS_SCHEMA_SQL = """
SELECT event_type,
       array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
       COUNT(*) AS n_events
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
GROUP BY 1, 2
"""


def order_window_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-window functions the first battery leaves out:
    percent_rank / cume_dist / first_value / nth_value, all riding ONE
    ``partitionBy(custkey)`` sort like battery I. Ratios round to 6
    (identical integer-rank inputs both engines, rounding only guards
    the division); the value picks are exact doubles of exact decimals.
    """
    from pyspark.sql import Window

    orders = typed_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price_dbl = F.col("o_totalprice").cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(seq), 6).alias("seq_percent_rank"),
        F.round(F.cume_dist().over(seq), 6).alias("seq_cume_dist"),
        F.first(price_dbl).over(full).alias("first_order_total"),
        F.coalesce(F.nth_value(price_dbl, 2).over(full), F.lit(-1.0)).alias(
            "second_order_total"
        ),
    )


ORDER_WINDOW_BATTERY2_SQL = """
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER seq, 6) AS seq_percent_rank,
       round(cume_dist() OVER seq, 6) AS seq_cume_dist,
       first_value(CAST(o_totalprice AS DOUBLE)) OVER w_full AS first_order_total,
       COALESCE(nth_value(CAST(o_totalprice AS DOUBLE), 2) OVER w_full, -1.0)
         AS second_order_total
FROM orders
WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- item-item similarity top-k (co-occurrence cosine) ----------------------
# The collaborative-filtering primitive ("customers who bought X also
# bought Y"): cosine over the order-membership incidence vectors,
# cos(i,j) = c_ij / sqrt(c_i * c_j) with c_* exact DISTINCT-order
# counts. RANKING never touches the float cosine: the sort key is the
# integer fixed point (c_ij^2 * 10^6) div (c_i * c_j) — monotone in
# cosine^2 since all counts are positive — so neighbor lists are
# bit-identical across engines and layouts (the float is reported
# beside it, round-6, for the human reading the list).
ITEM_SIM_K = 5
_ITEM_SIM_FP = 1_000_000  # fixed-point scale; at 100 TB promote the
# cross-product to DECIMAL(38,0)/HUGEINT (house rule) — int64 holds to
# c_ij ~ 3e6 co-orders at this scale, 6 orders of headroom at the gate


def item_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``ITEM_SIM_K`` co-purchase neighbors per part by cosine.

    Scale design: distinct (order, part) projection first (ONE shuffle;
    multi-line items never inflate counts), the pair join fans out by
    (basket choose 2) — a per-order constant (max basket 13 in the
    fixture), the Σ b² bound of `part_cooccurrence`. Per-part order
    counts are a |parts|-row frame joined back with an explicit
    broadcast (derived tiny frame → static planner would SMJ,
    CLAUDE.md). The per-item ranking goes through ``shard_topk_prune``
    so no task ever holds one hub item's full partner list.
    """
    from etl_mini_dw_spark.functions.simsearch import shard_topk_prune

    li = (
        typed_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    cnt = li.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = li.select("ok", F.col("pk").alias("pa"))
    b = li.select("ok", F.col("pk").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cij"))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"), "cij")
    )
    scored = (
        sym.join(
            F.broadcast(cnt.select(F.col("pk").alias("pa"), F.col("c").alias("ca"))),
            "pa",
        )
        .join(
            F.broadcast(cnt.select(F.col("pk").alias("pb"), F.col("c").alias("cb"))),
            "pb",
        )
        .withColumn(
            "sim_fp",
            F.expr(f"(cij * cij * {_ITEM_SIM_FP}) div (ca * cb)").cast("bigint"),
        )
        .withColumn(
            "cosine",
            F.round(
                F.col("cij").cast("double")
                / F.sqrt((F.col("ca") * F.col("cb")).cast("double")),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pa").orderBy(F.col("sim_fp").desc(), F.col("pb"))
    pruned = shard_topk_prune(
        scored, ["pa"], [F.col("sim_fp").desc(), F.col("pb")], ITEM_SIM_K, "pb"
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ITEM_SIM_K)
        .select(
            F.col("pa").alias("part_id"),
            F.col("pb").alias("partner_id"),
            F.col("ca").alias("n_orders_a"),
            F.col("cb").alias("n_orders_b"),
            F.col("cij").alias("n_co"),
            "sim_fp",
            "cosine",
            "rank",
        )
    )


ITEM_ITEM_SIMILARITY_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
cnt AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY pk),
pairs AS (
  SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS cij
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2),
sym AS (SELECT pa, pb, cij FROM pairs
        UNION ALL SELECT pb, pa, cij FROM pairs),
scored AS (
  SELECT s.pa, s.pb, ca.c AS ca, cb.c AS cb, s.cij,
         CAST((s.cij * s.cij * {_ITEM_SIM_FP}) // (ca.c * cb.c) AS BIGINT)
           AS sim_fp,
         round(CAST(s.cij AS DOUBLE)
               / sqrt(CAST(ca.c * cb.c AS DOUBLE)), 6) AS cosine
  FROM sym s JOIN cnt ca ON ca.pk = s.pa JOIN cnt cb ON cb.pk = s.pb)
SELECT pa AS part_id, pb AS partner_id, ca AS n_orders_a, cb AS n_orders_b,
       cij AS n_co, sim_fp, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY pa
                                   ORDER BY sim_fp DESC, pb) AS rn
      FROM scored)
WHERE rn <= {ITEM_SIM_K}
"""

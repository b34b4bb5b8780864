"""SmartStore daily-sales mart: tier bounds, cost-weight amount splits,
order-level max delivery fee.

Parity targets (semantics, not code) in dbt_postgres/models/
intermediate/sales/smartstore/smartstore__sales_daily.sql:

- ``delivery_tiers`` (:18-31): quantity tiers per delivery group with
  LEAD(min_unit) upper bounds (open top tier -> 9999) and the summed
  COALESCE'd extra costs — the W5 tier-bounds idiom.
- ``explode_bundle_orders`` (:140-166): LATERAL unnest of the CSV
  bundle with ':'-suffixed SKU multipliers (regex-guarded int parse,
  default 1) and org-price cost lookup.
- ``split_by_cost_weight`` (:170-216, :333-374): proportional
  allocation of order amounts over bundle rows by cost weight —
  ROUND(amount * cost/total) per row, remainder folded into the FIRST
  row (ROW_NUMBER by product) so group totals are preserved exactly;
  groups of one bypass the split untouched. Rounding is
  floor(x + 0.5) in both engines (the catalog's determinism rule).
- ``max_delivery_fee`` (:263-300): per-(order, invoice, group)
  aggregate, tier-range join (qty BETWEEN min_unit AND max_unit), the
  4-branch fee rule, then DISTINCT ON (order, invoice) keeping the
  LARGEST-ABSOLUTE fee (A7 with ABS ordering; fee/group tiebreaks make
  the winner engine-independent).

Scale notes
-----------
- The tier dim and price dim are broadcast; the only shuffles are the
  per-group allocation windows (keyed by order ids — uniform) and the
  final daily aggregation.
- Everything is built-in column expressions (codegen); the explode
  fan-out is bounded by bundle size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "delivery_tiers",
    "split_by_cost_weight",
    "max_delivery_fee",
    "sku_quantity",
    "opt_to_sbn_relation",
]

OPEN_TIER_MAX = 9999  # smartstore__sales_daily.sql:23


def delivery_tiers(dlv: DataFrame) -> DataFrame:
    """Tier table with LEAD-derived [min_unit, max_unit] bounds.

    The top tier of each group is open-ended (max_unit 9999); extra
    cost folds the four optional cost components, NULL-as-zero.
    """
    w = Window.partitionBy("delivery_group").orderBy(F.col("min_unit").asc())
    wg = Window.partitionBy("delivery_group")
    min_unit = F.coalesce(F.col("min_unit"), F.lit(1))
    extra = (
        F.coalesce(F.col("coolant_cost"), F.lit(0))
        + F.coalesce(F.col("label_cost"), F.lit(0))
        + F.coalesce(F.col("wrap_cost"), F.lit(0))
        + F.coalesce(F.col("box_cost"), F.lit(0))
    )
    return dlv.select(
        "delivery_group",
        min_unit.alias("min_unit"),
        F.when(
            F.max("min_unit").over(wg) == F.col("min_unit"), F.lit(OPEN_TIER_MAX)
        )
        .otherwise(F.lead("min_unit").over(w))
        .alias("max_unit"),
        F.coalesce(F.col("delivery_fee"), F.lit(0)).alias("delivery_fee"),
        extra.alias("extra_cost"),
        F.coalesce(F.col("n_arrival_fee"), F.lit(0)).alias("n_arrival_fee"),
        F.coalesce(F.col("n_arrival_add"), F.lit(0)).alias("n_arrival_add"),
    )


def sku_quantity(bundle_product: Column | str, order_quantity: Column | str) -> Column:
    """':N'-suffixed SKU multiplier x order quantity (:148-153): the
    suffix must be all digits, anything else (or absent) counts as 1."""
    b = F.col(bundle_product) if isinstance(bundle_product, str) else bundle_product
    q = F.col(order_quantity) if isinstance(order_quantity, str) else order_quantity
    # try_element_at: NULL (not an error) past the end even in ANSI mode
    suffix = F.try_element_at(F.split(b, ":"), F.lit(2))
    mult = F.when(suffix.rlike("^[0-9]+$"), suffix.cast("int")).otherwise(F.lit(1))
    return (mult * q).alias("sku_quantity")


def split_by_cost_weight(
    df: DataFrame,
    keys: Sequence[str],
    amount_cols: Sequence[str],
    cost_col: str = "cost_amount",
    order_col: str = "product_id",
) -> DataFrame:
    """Allocate ``amount_cols`` over each key group by cost weight.

    Per group: split_i = floor(amount * cost_i / total_cost + 0.5)
    (NULL-safe -> 0), with the rounding remainder folded into the first
    row ordered by ``order_col`` so SUM(split) == amount exactly.
    Groups of one keep their amounts untouched (the reference splits
    only ``bundle_product_count > 1`` and unions the singletons back).
    """
    wg = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    out = (
        df.withColumn("__n", F.count(F.lit(1)).over(wg))
        .withColumn("__total_cost", F.sum(cost_col).over(wg))
        .withColumn("__rn", F.row_number().over(wo))
    )
    for c in amount_cols:
        split = F.coalesce(
            F.floor(
                F.col(c)
                * (F.col(cost_col) / F.nullif(F.col("__total_cost"), F.lit(0)))
                + F.lit(0.5)
            ).cast("long"),
            F.lit(0),
        )
        out = out.withColumn(f"__split_{c}", split)
        adjusted = (
            F.when(
                F.col("__rn") == 1,
                F.col(c) - F.sum(f"__split_{c}").over(wg),
            ).otherwise(F.lit(0))
            + F.col(f"__split_{c}")
        )
        out = out.withColumn(c, F.when(F.col("__n") > 1, adjusted).otherwise(F.col(c)))
    return out.drop("__n", "__total_cost", "__rn", *[f"__split_{c}" for c in amount_cols])


def max_delivery_fee(po: DataFrame, tiers: DataFrame) -> DataFrame:
    """Largest-absolute delivery fee per (order, invoice) (:263-300).

    5-1: aggregate delivery data per (order, invoice, group);
    5-2: fee under the matching quantity tier — missing tier keeps the
    order's own fee, positive order fee adds box-or-extra cost,
    delivery_type 7 uses the arrival fee schedule, else tier fee+extra;
    5-3: DISTINCT ON (order, invoice) by ABS(fee) DESC with fee/group
    tiebreaks (the reference's ordering is partial; the tiebreaks make
    the winner deterministic without changing the max-ABS semantics).
    """
    agg = po.groupBy("order_id", "invoice_no", "delivery_group").agg(
        F.max("delivery_type").alias("delivery_type"),
        F.max("delivery_fee").alias("delivery_fee"),
        F.sum("box_cost").alias("box_cost"),
        F.coalesce(F.sum("delivery_quantity"), F.lit(0)).alias("delivery_quantity"),
    )
    t = tiers.select(
        F.col("delivery_group").alias("__tg"),
        "min_unit",
        "max_unit",
        F.col("delivery_fee").alias("__tier_fee"),
        "extra_cost",
        "n_arrival_fee",
        "n_arrival_add",
    )
    j = agg.join(
        broadcast(t),
        (agg.delivery_group == t.__tg)
        & agg.delivery_quantity.between(t.min_unit, t.max_unit),
        "left",
    )
    fee = (
        F.when(F.col("__tg").isNull(), F.col("delivery_fee"))
        .when(
            F.col("delivery_fee") > 0,
            F.col("delivery_fee")
            + F.when(F.col("box_cost") > 0, F.col("box_cost")).otherwise(
                F.col("extra_cost")
            ),
        )
        .when(
            F.col("delivery_type") == 7,
            F.col("n_arrival_fee")
            + F.col("n_arrival_add") * (F.col("delivery_quantity") - F.col("min_unit")),
        )
        .otherwise(F.col("__tier_fee") + F.col("extra_cost"))
    )
    scored = j.select(
        "order_id", "invoice_no", "delivery_group", fee.alias("delivery_fee")
    )
    w = Window.partitionBy("order_id", "invoice_no").orderBy(
        F.abs(F.col("delivery_fee")).desc(),
        F.col("delivery_fee").desc(),
        F.col("delivery_group").asc(),
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def opt_to_sbn_relation(
    existing_rel: DataFrame,
    order_options: DataFrame,
    mapping_id: DataFrame,
    mapping_name: DataFrame,
    add_product: DataFrame,
    sbn_options: DataFrame,
    shop_id: str = "shop0055",
) -> DataFrame:
    """SmartStore option -> sabangnet bundle relation with auto-matching.

    ~ relation__smt_opt_to_sbn_ids (dbt_postgres/models/intermediate/
    sales/smartstore/relation__smt_opt_to_sbn_ids.sql): options absent
    from the curated relation are matched by product type —
    type 0 by product id against the id mapping (:31-40, option id =
    product_id || '-0001'); type 1 by sku name against the name mapping,
    where a '$수량$' placeholder compiles into a regex (escape the
    literal parts, placeholder -> '[^/]* / [^/]*', edge placeholders ->
    '[^/]*', :42-67); type 2 by the '[group]'-prefixed product name or
    the space-stripped 'group:option' concat against the add-product
    catalog (:69-87). Matches resolve to bundles via the sabangnet
    option table ('option:1' self-bundle default, '-NNNN' sku suffixes
    stripped, :89-108), and ONE bundle per option wins — fewest bundle
    items, then lowest option id (:117-130 ROW_NUMBER).

    Scale notes: every mapping/catalog input is a dimension (broadcast);
    the OR-condition type-2 match is a broadcast nested-loop on dim
    cardinality, never fact-sized. The final ROW_NUMBER partitions on
    option_id_smt — per-option groups of a handful of candidates.
    """
    opts = order_options.alias("opt").join(
        existing_rel.select("option_id").alias("rel"),
        F.col("opt.option_id") == F.col("rel.option_id"),
        "left_anti",
    )

    # type 0: id-mapped products, synthesized '-0001' default option.
    m_id = mapping_id.filter(F.col("shop_id") == shop_id).alias("map")
    type0 = (
        opts.filter(F.col("opt.product_type") == 0)
        .join(
            broadcast(m_id),
            F.col("opt.product_id").cast("string") == F.col("map.product_id_shop"),
        )
        .select(
            F.col("opt.option_id").alias("option_id_smt"),
            F.concat(F.col("map.product_id"), F.lit("-0001")).alias("option_id_sbn"),
        )
    )

    # type 1: sku-name match; '$수량$' placeholder compiles to a regex.
    qty_marker = "$수량$"
    escaped = F.regexp_replace(
        F.replace(F.col("sku_name"), F.lit(qty_marker), F.lit("__수량__")),
        r"([\*\+\?\$\^\.\[\]\{\}\(\)\|])",
        r"\\$1",
    )
    pattern = F.replace(
        F.regexp_replace(
            F.regexp_replace(escaped, "^__수량__", r"[^/]*"),
            "__수량__$",
            r"[^/]*",
        ),
        F.lit("__수량__"),
        F.lit("[^/]* / [^/]*"),
    )
    m_name = (
        mapping_name.filter(F.col("shop_id") == shop_id)
        .withColumn("sku_pattern", pattern)
        .alias("map")
    )
    name_cond = F.when(
        F.col("map.sku_name").contains(qty_marker),
        F.regexp_like(F.col("opt.option_name"), F.col("map.sku_pattern")),
    ).otherwise(F.col("opt.option_name") == F.col("map.sku_name"))
    type1 = (
        opts.filter(F.col("opt.product_type") == 1)
        .join(
            broadcast(m_name),
            (F.col("opt.product_id").cast("string") == F.col("map.product_id_shop"))
            & name_cond,
        )
        .select(
            F.col("opt.option_id").alias("option_id_smt"),
            F.col("map.option_id").alias("option_id_sbn"),
        )
    )

    # type 2: '[group]'-prefixed add products, two alternative matches.
    t2 = (
        opts.filter(F.col("opt.product_type") == 2)
        .select(
            F.col("opt.option_id").alias("option_id_smt"),
            # Postgres regexp_match yields NULL on no-match; Spark's
            # regexp_extract yields '' — NULLIF restores NULL-never-
            # matches so an unprefixed product_name can't equi-join an
            # add_product row whose group_id is ''.
            F.nullif(
                F.regexp_extract(F.col("opt.product_name"), r"^\[([^\]]+)\]", 1),
                F.lit(""),
            ).alias("opt_group_id"),
            F.trim(
                F.regexp_replace(F.col("opt.product_name"), r"^\[[^\]]+\]", "")
            ).alias("opt_product_name"),
            F.col("opt.option_name").alias("opt_option_name"),
        )
        .alias("t2")
    )
    prd = add_product.alias("prd")
    strip = lambda c: F.replace(F.col(c), F.lit(" "), F.lit(""))  # noqa: E731
    type2 = t2.join(
        broadcast(prd),
        (
            (F.col("t2.opt_group_id") == F.col("prd.group_id"))
            & (F.col("t2.opt_product_name") == F.col("prd.option_name"))
        )
        | (
            strip("t2.opt_option_name")
            == F.concat(strip("prd.group_name"), F.lit(":"), strip("prd.option_name"))
        ),
    ).select(
        F.col("t2.option_id_smt").alias("option_id_smt"),
        F.col("prd.option_id").alias("option_id_sbn"),
    )

    matched = type0.unionByName(type1).unionByName(type2).alias("smt")
    auto = matched.join(
        broadcast(sbn_options.select("option_id", "bundle_option_ids").alias("sbn")),
        F.col("smt.option_id_sbn") == F.col("sbn.option_id"),
        "left",
    ).select(
        "smt.option_id_smt",
        "smt.option_id_sbn",
        F.regexp_replace(
            F.coalesce(
                F.col("sbn.bundle_option_ids"),
                F.concat(F.col("smt.option_id_sbn"), F.lit(":1")),
            ),
            "-[0-9]{4}",
            "",
        ).alias("bundle_product_ids"),
    )

    w = Window.partitionBy("option_id_smt").orderBy(
        F.size(F.split(F.col("bundle_product_ids"), ",")).asc(),
        F.col("option_id_sbn").asc(),
    )
    best = (
        auto.withColumn("option_rank", F.row_number().over(w))
        .filter(F.col("option_rank") == 1)
        .select(
            F.col("option_id_smt").alias("option_id"),
            "bundle_product_ids",
        )
    )
    return existing_rel.select("option_id", "bundle_product_ids").unionByName(best)

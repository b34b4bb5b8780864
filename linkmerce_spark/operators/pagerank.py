"""Fixed-iteration weighted PageRank (domain-authority scoring).

Link-graph authority is a standard corpus-curation signal: Common
Crawl pipelines weight domains by a centrality score before sampling
(harmonic/PageRank centrality — Brin & Page 1998). This module
implements the power-iteration form with a FIXED iteration count as
one lazy DataFrame plan:

- the loop is unrolled into the plan, not driven from Python: each
  iteration is [join ranks onto the edge list -> sum contributions per
  destination -> blend with the teleport term], so the whole
  ``n_iter``-round computation is ONE job with a linear chain of
  ``n_iter`` joins — no per-round driver action, no lineage blowup
  (ranks are referenced once per round; the edge list is
  localCheckpoint'ed once and re-read every round);
- per-iteration cost at scale is one shuffle over the EDGE list
  (nodes-sized agg piggybacks) — the Pregel cost model without the
  Pregel machinery, appropriate because the iteration count is a
  constant, not convergence-driven;
- determinism across engines: double SUM order is shuffle-dependent,
  so each edge's contribution ``(w/out) * r`` is quantized to int64
  at scale 1e15 (``floor(x*1e15 + 0.5)``) and summed EXACTLY; the
  per-round blend is then a fixed sequence of scalar IEEE ops on
  identical operands — ranks are bit-identical on any engine or
  partitioning, which is what lets a SQL twin unroll the same rounds.

Reference behavioral parity: the reference has no graph layer; this
extends the curation suite (domain mixture weights, group splits)
with the authority signal those ops consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_QUANT = 1_000_000_000_000_000.0  # 1e15: exact in double; sums fit int64


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank after exactly ``n_iter`` power iterations.

    ``edges``: directed (src, dst, weight>0); ``nodes``: the full node
    universe (isolated nodes keep the teleport-only rank). Dangling
    nodes (in ``nodes`` but with no out-edges) simply contribute
    nothing — the standard "teleport absorbs dangling mass"
    simplification; on a symmetric edge list there are none.

    Returns (node, out_w, pagerank): total out-weight (0 for isolated
    nodes) and the final rank.
    """
    if n_iter <= 0:
        raise ValueError("n_iter must be positive")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    omd = 1.0 - damping  # the Python float, mirrored verbatim in twins
    out_w = edges.groupBy(F.col(src).alias("__src")).agg(
        F.sum(weight).cast("bigint").alias("__out_w")
    )
    e = (
        edges.join(out_w, F.col(src) == F.col("__src"))
        .select(
            F.col(src).alias("__esrc"),
            F.col(dst).alias("__edst"),
            F.col(weight).cast("bigint").alias("__w"),
            "__out_w",
        )
        .localCheckpoint(eager=True)  # re-read by every iteration
    )
    verts = nodes.select(F.col(node).alias("__node")).distinct().localCheckpoint(
        eager=True
    )
    # |V| reaches the driver as ONE scalar (the sanctioned k-sized
    # collect) — folding 1/n into literals keeps every iteration free
    # of the 1-row crossJoin a column-borne n would need, and the
    # Python IEEE divisions below are bit-identical to the SQL twin's
    # (same operands, correctly rounded).
    n = verts.count()
    if n == 0:
        raise ValueError("nodes must be non-empty")
    ranks = verts.select("__node", F.lit(1.0 / float(n)).alias("__r"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.__esrc == ranks.__node)
            .select(
                "__edst",
                F.floor(
                    (
                        F.col("__w").cast("double")
                        / F.col("__out_w").cast("double")
                    )
                    * F.col("__r")
                    * F.lit(_QUANT)
                    + F.lit(0.5)
                ).alias("__c"),
            )
            .groupBy("__edst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = ranks.join(
            contrib, ranks.__node == contrib.__edst, "left"
        ).select(
            "__node",
            (
                F.lit(omd / float(n))
                + F.lit(damping)
                * (
                    F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                    / F.lit(_QUANT)
                )
            ).alias("__r"),
        )
    return ranks.join(out_w, ranks.__node == out_w.__src, "left").select(
        F.col("__node").alias(node),
        F.coalesce("__out_w", F.lit(0)).cast("bigint").alias("out_w"),
        F.col("__r").alias("pagerank"),
    )


def shared_gram_edges(
    df: DataFrame,
    text_col: str,
    group_col: str,
    n: int = 8,
    min_groups: int = 2,
    max_groups: int = 4,
) -> DataFrame:
    """Copy-graph edges between document groups (sources/domains).

    Two groups are linked when they share a word ``n``-gram that
    appears in ``min_groups..max_groups`` DISTINCT groups — shared
    enough to witness copying, bounded enough to exclude boilerplate
    (the same frequency-cap discipline as the rare-gram screen and
    dup-span coverage: the cap bounds the per-gram pair fan-out, so
    the self-join cannot quadratically blow up on a stop-gram).
    Edge weight = number of distinct shared kept grams; the list is
    symmetric by construction (both directions emitted).

    Shuffles: gram distinct (1), gram frequency (piggybacked), the
    capped self-join (1), pair rollup (1) — all on uniform gram/pair
    hash keys.
    """
    if min_groups < 2 or max_groups < min_groups:
        raise ValueError("need 2 <= min_groups <= max_groups")
    words = F.split(F.col(text_col), " ")
    n_grams = F.size(words) - n + 1
    starts = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(starts).alias("__pos"),
            words.alias("__w"),
        )
        .select(
            "__g",
            F.xxhash64(
                F.array_join(F.slice(F.col("__w"), F.col("__pos"), n), " ")
            ).alias("__gram"),
        )
        .distinct()
    )
    keep = (
        grams.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__nsrc"))
        .where(
            (F.col("__nsrc") >= min_groups) & (F.col("__nsrc") <= max_groups)
        )
        .select("__gram")
    )
    kept = grams.join(keep, "__gram")
    other = kept.select(
        F.col("__gram").alias("__gram2"), F.col("__g").alias("__g2")
    )
    return (
        kept.join(other, kept.__gram == other.__gram2)
        .where(F.col("__g") != F.col("__g2"))
        .groupBy(F.col("__g").alias("src"), F.col("__g2").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )

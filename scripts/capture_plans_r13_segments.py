"""Pre-checkpoint plan segments for the checkpointed queries
(VERDICT r12 #7): the committed `plans/` dumps for LPA, market_basket
and BPE only show the post-checkpoint scan, so the r12 shuffle-saving
claims were verified in code, not in a dump. This script rebuilds each
query's pre-checkpoint DataFrame (same expressions as the query
source; the LPA edge base is the importable co_supply_weighted) and
captures its formatted plan into plans/r13/<label>_segment.txt.

    python scripts/capture_plans_r13_segments.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from matrix_multiplication_map_reduce_gcp_spark.catalog import (  # noqa: E402
    load_table,
)
from matrix_multiplication_map_reduce_gcp_spark.operators.pagerank import (  # noqa: E402
    co_supply_weighted,
)
from matrix_multiplication_map_reduce_gcp_spark.plans.explain import (  # noqa: E402
    formatted_plan,
)
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark  # noqa: E402
from matrix_multiplication_map_reduce_gcp_spark.text.analysis import (  # noqa: E402
    tokens,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans_r13_segments")

    segments = {}

    # market_basket_pairs: the checkpointed basket table (ONE
    # collect_set shuffle with map-side partial aggregation — the r12
    # claim the headline dump could not show).
    segments["market_basket_pairs_baskets"] = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("s"))
    )

    # label_propagation_communities / supplier_two_hop_reach /
    # k_core_suppliers: the shared co-supply edge base (one vocabulary
    # shuffle + map-side ordered-pair explode + one count aggregate).
    segments["label_propagation_co_supply"] = co_supply_weighted(
        spark, SF_DIR
    )

    # bpe_train_merges: (a) the one-pass (word, cnt) vocabulary fold
    # that gets checkpointed, (b) one merge round's cnt-weighted pair
    # count + winner over the UNcheckpointed vocab — the per-iteration
    # shape.
    d = load_table(spark, SF_DIR, "documents")
    vocab = (
        d.select(F.explode(tokens()).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
    )
    segments["bpe_vocab_fold"] = vocab
    segments["bpe_round_pair_counts"] = (
        vocab.filter(F.length("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("pair"),
            F.col("cnt"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
    )

    for label, df in segments.items():
        plan = formatted_plan(df)
        with open(os.path.join(outdir, f"{label}_segment.txt"), "w") as fh:
            fh.write(plan)
        print(label, "ok")
    spark.stop()


if __name__ == "__main__":
    main()

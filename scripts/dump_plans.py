"""Regenerate the raw material for PLANS.md: formatted physical plans of the
headline queries at sf0.01. Usage: python scripts/dump_plans.py [query ...]"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from incremental_datapipeline_using_snowflake_spark.queries import all_queries  # noqa: E402
from incremental_datapipeline_using_snowflake_spark.session import get_session  # noqa: E402

DEFAULT = [
    "q1_pricing_summary", "q3_top_revenue", "bm25_search", "dedup_minhash_lsh",
    "ann_ivfpq_topk", "stratified_sample_n", "event_window_agg", "corpus_curation",
    "pagerank_centrality", "zorder_layout", "corpus_mixture", "passage_dedup",
    "lateral_join", "recursive_cte",
]


def main() -> None:
    spark = get_session("plans", shuffle_partitions=32)
    qs = all_queries()
    for name in sys.argv[1:] or DEFAULT:
        df = qs[name][0](spark, "/root/testdata/sf0.01")
        print(f"@@@ {name}")
        df.explain("formatted")


if __name__ == "__main__":
    main()

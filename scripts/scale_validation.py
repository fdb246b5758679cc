"""Scale validation of the dedup/ANN family: is wall time linear in input?

The 100-TB claims in SHUFFLE.md argue from plan shape (blocked candidate
spaces, bucketed self-joins, mergeable sketches). This script tests them
EMPIRICALLY off toy scale: it builds corpora at 1x / 4x / 16x the driver's
sf0.1 size by SHARDING the real tables through structure-preserving
transforms — shard 0 is the real corpus verbatim; shard r applies a
per-shard vocabulary permutation to documents (bijective on shingles, so
every planted near-dup group and length distribution survives EXACTLY) and
an orthogonal coordinate-permutation + sign-flip to embeddings (cosines
preserved EXACTLY, so the planted ANN/cluster structure survives). Dup
rate and cluster structure are therefore held constant while n grows:
output is linear in n by construction, and any super-linear WALL TIME is
the engine's fault, not the data's.

It then runs the declared dedup/ANN queries on each size and fits
per-query scaling exponents alpha = log(y_hi/y_lo) / log(size ratio) for
wall time, shuffle bytes, and output rows. alpha ~ 1 = linear;
alpha ~ 2 = a quadratic pair space (the thing the blocking prevents).

Generated data lives under /tmp (never /root/testdata); results are
recorded in BASELINE.md. Usage::

    python scripts/scale_validation.py [--mults 1,4,16] [--queries a,b,...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

from shuffle_metrics import collect_metrics  # noqa: E402

BASE_SF_DIR = "/root/testdata/sf0.1"
BASE_DOCS = 5000       # sf0.1 documents rows
BASE_VECS = 2000       # sf0.1 embeddings rows

FAMILY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "passage_dedup",
    "dedup_clusters",
    "semdedup_keep",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "knn_graph",
    "kmeans_clusters",
    "knn_graph_auto",
    "semdedup_auto",
    "knn_graph_lsh",
    "knn_graph_ivf2",
    "semdedup_lsh_auto",
    "neardup_triangles",
    # r07 additions
    "dedup_bloom_membership",
    "passage_dedup_maximal",
    "corpus_curate_append",
    "bpe_train_merges",
    "bpe_encode_docs",
    "decontaminate_passages",
    "url_dedup",
    "epoch_shuffle_order",
    "hard_negative_mining",
    "text_normalization",
    # r08 additions
    "hard_negative_mining_ivf",
    "snowflake_dialect_flatten",
    "leakage_safe_split",
    "hybrid_search_rrf",
    "html_text_extraction",
    # r09 additions
    "main_content_extraction",
    "lang_id_trained",
    "corpus_delete_apply",
    "corpus_curate_reindexed",
    "ccnet_quality_buckets",
    # r10 additions
    "lang_id_margin",
    "crawl_pipeline_e2e",
    "dsir_selection",
    "boilerplate_scrub",
    "mixture_temperature_weights",
    "tokenizer_fertility",
    "jsonl_ingest",
    "dedup_minhash_recall",
    "intra_doc_scrub",
    "data_schedule",
    "dedup_winnowing",
    "dedup_simhash_hamming",
    "bm25_index_lifecycle",
    "curriculum_order",
    "span_corruption_pairs",
    "packing_efficiency",
    # r11 additions
    "cjk_segmentation",
    "cjk_quality_gates",
    "cjk_boilerplate_scrub",
    "fertility_by_script",
    "dedup_winnow_recall",
    "dedup_simhash_recall",
    "ann_index_reindex",
    "length_bucket_report",
    "gopher_char_gates",
    "dedup_emblsh_recall",
    # r12 additions
    "sea_segmentation",
    "ivf_routed_assign",
    "dedup_ngram_recall",
    "corpus_chain_rebase",
    "dedup_impact_report",
    "classifier_pr_curve",
    "ivf_routed_agreement",
    # r13 additions
    "ann_sq8_topk",
    "ann_ivf_sq8_topk",
    "ann_sq8_rerank",
    "sq8_recall",
    "corpus_shard_export",
    "corpus_shard_tokens",
    "ann_index_sq8",
    "corpus_shard_append",
]


def generate(out_dir: str, mult: int, seed: int = 42) -> None:
    """Write documents.parquet + embeddings.parquet at ``mult``x sf0.1 size:
    ``mult`` structure-preserving shards of the REAL sf0.1 tables."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs0 = pq.read_table(f"{BASE_SF_DIR}/documents.parquet")
    emb0 = pq.read_table(f"{BASE_SF_DIR}/embeddings.parquet")
    base_texts = docs0.column("text").to_pylist()
    vocab = sorted({w for t in base_texts for w in t.split()})
    base_ids = docs0.column("doc_id").to_pylist()
    langs = docs0.column("lang").to_pylist()
    sources = docs0.column("source").to_pylist()
    vecs0 = np.array(emb0.column("embedding").to_pylist(), dtype=np.float32)
    vids0 = np.array(emb0.column("vec_id").to_pylist())
    labels0 = emb0.column("label").to_pylist()

    doc_ids: list[int] = []
    texts: list[str] = []
    all_langs: list[str] = []
    all_sources: list[str] = []
    vec_parts = []
    vid_parts = []
    for r in range(mult):
        rng = np.random.default_rng(seed * 1000 + r)
        if r == 0:
            shard_texts = base_texts
        else:
            perm = {w: p for w, p in zip(vocab, rng.permutation(vocab))}
            shard_texts = [
                " ".join(perm[w] for w in t.split()) for t in base_texts
            ]
        texts.extend(shard_texts)
        doc_ids.extend(i + r * BASE_DOCS for i in base_ids)
        all_langs.extend(langs)
        all_sources.extend(sources)
        if r == 0:
            vec_parts.append(vecs0)
        else:
            cperm = rng.permutation(vecs0.shape[1])
            signs = rng.choice([-1.0, 1.0], size=vecs0.shape[1]).astype(np.float32)
            vec_parts.append(vecs0[:, cperm] * signs)  # orthogonal: cosines kept
        vid_parts.append(vids0 + r * BASE_VECS)

    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(all_langs, pa.string()),
            "source": pa.array(all_sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array(np.concatenate(vid_parts), pa.int64()),
            "embedding": pa.array(
                np.concatenate(vec_parts).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(labels0 * mult, pa.int32()),
        }
    )
    pq.write_table(emb, f"{out_dir}/embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--queries", default=",".join(FAMILY))
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    names = args.queries.split(",")

    from incremental_datapipeline_using_snowflake_spark.queries import all_queries
    from incremental_datapipeline_using_snowflake_spark.session import get_session

    spark = get_session("scale-validation")
    qs = {n: fn for n, (fn, _sql) in all_queries().items() if n in names}

    # auto-scaled ops forms (n_cells=None -> sqrt(n) IVF cells): the scale
    # defaults the declared queries can't use (their oracles pin n_cells)
    def _knn_auto(spark, d):
        from incremental_datapipeline_using_snowflake_spark.ops import similarity as S

        return S.knn_graph(spark.read.parquet(f"{d}/embeddings.parquet"), k=3, n_cells=None)

    def _semdedup_auto(spark, d):
        from incremental_datapipeline_using_snowflake_spark.ops import similarity as S

        return S.semantic_dedup_keep(
            spark.read.parquet(f"{d}/embeddings.parquet"), threshold=0.999, n_cells=None
        )

    def _knn_lsh(spark, d):
        from incremental_datapipeline_using_snowflake_spark.ops import similarity as S

        return S.knn_graph_lsh(spark.read.parquet(f"{d}/embeddings.parquet"), k=3)

    def _semdedup_lsh(spark, d):
        from incremental_datapipeline_using_snowflake_spark.ops import similarity as S

        return S.semantic_dedup_keep_lsh(
            spark.read.parquet(f"{d}/embeddings.parquet"), threshold=0.999
        )

    def _inc_emb_auto(spark, d):
        from pyspark.sql import functions as F

        from incremental_datapipeline_using_snowflake_spark.ops.dedup import (
            incremental_embedding_pairs,
        )

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        corpus = emb.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
        )
        batch = emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x.cast("double") * 1.001
            ).alias("embedding"),
        )
        # n_planes=None -> log2(n/target_bucket) planes: bucket population
        # stays constant as the corpus grows (the declared query pins 5
        # planes for oracle replay, which goes quadratic past toy sizes)
        return incremental_embedding_pairs(
            batch, corpus, dim=64, threshold=0.999, n_tables=2, n_planes=None
        )

    # corpus_curate_reindexed (r09 — verdict ask #2 evidence): the steady
    # state BEHIND the auto re-index trigger. SETUP (untimed): bootstrap at
    # the frozen-small 5-plane structure (the regime the declared
    # corpus_curate_append row documents at alpha_t 1.22) and curate HALF
    # the planted batch with auto_reindex on — at 4x/16x the corpus has
    # outgrown 5 planes, so the trigger fires and rebuilds. MEASURED: the
    # second half-batch run against the re-indexed store — the nightly-run
    # shape every post-trigger run takes. Linear alpha_t here is the
    # trigger's whole point.
    _reindex_state: dict = {}

    def _curate_reindexed_setup(spark, d):
        import tempfile as _tf

        from incremental_datapipeline_using_snowflake_spark.operators import TableStore
        from incremental_datapipeline_using_snowflake_spark.ops import curation as C
        from incremental_datapipeline_using_snowflake_spark.queries.curation_q import (
            _planted_batch,
        )

        corpus, corpus_emb, batch, batch_emb = _planted_batch(spark, d)
        store = TableStore(root=_tf.mkdtemp(prefix="scale_reindex_"))
        C.bootstrap_corpus(
            spark, store, corpus, "sc.docs",
            emb=corpus_emb, dim=64, n_tables=2, n_planes=5,
        )
        C.curate_append(
            spark, store, batch.filter("doc_id % 2 = 0"), "sc.docs", "run1",
            batch_emb=batch_emb.filter("vec_id % 2 = 0"),
        )
        st = C.curation_status(spark, store, "sc.docs")
        print(f"    [reindex setup] post-run1 planes={st['n_planes']} "
              f"drift={st['reindex_plane_drift']} "
              f"(trigger {'FIRED' if st['n_planes'] > 5 else 'not needed'})")
        _reindex_state[d] = (
            store,
            batch.filter("doc_id % 2 = 1"),
            batch_emb.filter("vec_id % 2 = 1"),
        )

    def _curate_reindexed_run(spark, d):
        from incremental_datapipeline_using_snowflake_spark.ops import curation as C

        store, b2, e2 = _reindex_state[d]
        return C.curate_append(
            spark, store, b2, "sc.docs", "run2", batch_emb=e2
        )

    # crawl_pipeline_e2e (r10 — verdict ask #5): the composed WARC→corpus
    # product wall at its OWN scaled fixture (synthetic crawl shards at
    # scale=m — the sharded documents corpus plays no role here). Setup
    # (untimed): shard synthesis, seed-corpus bootstrap, LID training.
    # Timed: the full per-batch pipeline. The returned frame is the 1-row
    # stage manifest, so alpha_rows/alpha_B read 0 — alpha_t is the signal.
    _crawl_state: dict = {}

    def _crawl_setup(spark, d):
        import tempfile as _tf

        from incremental_datapipeline_using_snowflake_spark.operators import TableStore
        from incremental_datapipeline_using_snowflake_spark.ops import curation as C
        from incremental_datapipeline_using_snowflake_spark.ops.text import (
            train_char_lid,
        )
        from incremental_datapipeline_using_snowflake_spark.plans.crawl import (
            make_lid_seed,
            make_synthetic_crawl,
        )

        base = os.path.basename(d)
        m = int(base[1:]) if base.startswith("m") and base[1:].isdigit() else 1
        crawl_dir = _tf.mkdtemp(prefix="scale_crawl_")
        make_synthetic_crawl(crawl_dir, scale=m, n_shards=8 * m)
        store = TableStore(root=_tf.mkdtemp(prefix="scale_crawlst_"))
        seed = spark.createDataFrame(
            [
                (i, " ".join(f"seed{i}w{j}" for j in range(15)), "en", "seed", 90)
                for i in range(3)
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        C.bootstrap_corpus(spark, store, seed, "crawl.docs")
        model = train_char_lid(
            make_lid_seed(spark), n_features=4096
        ).localCheckpoint(eager=True)
        _crawl_state[d] = (store, crawl_dir, model)

    def _crawl_run(spark, d):
        from incremental_datapipeline_using_snowflake_spark.plans.crawl import (
            run_crawl_pipeline,
        )

        store, crawl_dir, model = _crawl_state[d]
        man = run_crawl_pipeline(
            spark, store, crawl_dir, "crawl.docs", "scale",
            lid_model=model, lid_n_features=4096, min_margin_ppg=900_000,
        )
        flat = {k: v for k, v in man.items() if isinstance(v, int)}
        return spark.createDataFrame([flat])

    for extra, fn in [
        ("knn_graph_auto", _knn_auto),
        ("semdedup_auto", _semdedup_auto),
        ("knn_graph_lsh", _knn_lsh),
        ("semdedup_lsh_auto", _semdedup_lsh),
        ("dedup_embedding_incremental_auto", _inc_emb_auto),
        ("corpus_curate_reindexed", (_curate_reindexed_setup, _curate_reindexed_run)),
        ("crawl_pipeline_e2e", (_crawl_setup, _crawl_run)),
    ]:
        if extra in names:
            qs[extra] = fn

    results: dict[str, dict[int, tuple[float, float, int]]] = {n: {} for n in names}
    with tempfile.TemporaryDirectory(prefix="scalegen_") as root:
        for i, m in enumerate(mults):
            # hermetic per size: cached subtrees from the previous size
            # (shingle tables, pair tables, IVF assignments) otherwise fill
            # executor storage and eviction thrash distorts late-running
            # queries by >10x (measured: identical knn_graph code at alpha
            # 1.43 late-in-family vs 0.86 clean). WITHIN a size the family
            # cache-sharing stays (that reuse is the production shape).
            spark.catalog.clearCache()
            d = os.path.join(root, f"m{m}")
            t0 = time.time()
            generate(d, m)
            print(f"-- generated {m}x ({BASE_DOCS * m} docs / {BASE_VECS * m} vecs) "
                  f"in {time.time() - t0:.1f}s")
            if i == 0:
                # JVM/codegen warmup on a THROWAWAY corpus (different dir +
                # seed): warms JIT without priming the per-dir pair-table
                # caches, so every timed run below pays its own build
                w = os.path.join(root, "warmup")
                generate(w, 1, seed=991)
                for n in names:
                    if isinstance(qs[n], tuple):
                        setup_fn, run_fn = qs[n]
                        setup_fn(spark, w)
                        run_fn(spark, w).collect()
                    else:
                        qs[n](spark, w).collect()
            # explicit family warm (r13, VERDICT r12 ask #5): the shared
            # MinHash pair table + CC labels (_PAIR_CACHE) otherwise land
            # on whichever dedup sibling runs FIRST at each size, so that
            # query's alpha measures the family build, not its own work
            # (dedup_impact_report read alpha_t 1.36 in r12 for exactly
            # this reason). Build it untimed here and report its wall as
            # its own row — the per-query rows then measure per-query work.
            _pair_users = {
                "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
                "dedup_keep_summary", "dedup_keep_best", "dedup_impact_report",
                "neardup_triangles", "neardup_clustering_coeff",
            }
            if _pair_users & set(names):
                from incremental_datapipeline_using_snowflake_spark.queries import (
                    textops as _to,
                )

                t0 = time.time()
                _to._shared_pairs_components(spark, d)
                print(f"  {'[pair-family build]':26s} {time.time() - t0:7.2f}s"
                      "  (untimed in the per-query rows below)")
            for n in names:
                # (setup, run) pairs: setup is UNTIMED state-building (e.g.
                # the reindex entry's bootstrap + trigger-firing first run);
                # only the run phase is measured
                if isinstance(qs[n], tuple):
                    setup_fn, run_fn = qs[n]
                    setup_fn(spark, d)
                else:
                    run_fn = qs[n]
                t0 = time.time()
                df = run_fn(spark, d)
                rows = len(df.collect())  # executes THIS plan (metrics attach)
                wall = time.time() - t0
                met = collect_metrics(df)
                results[n][m] = (wall, met["shuffle_bytes"] / 1e6, rows)
                print(f"  {n:26s} {wall:7.2f}s  {met['shuffle_bytes']/1e6:8.2f} MB  "
                      f"{rows:>8,} rows")

    lo, hi = mults[-2], mults[-1]
    print(f"\nScaling exponents over the {lo}x -> {hi}x step "
          f"(alpha: 1=linear, 2=quadratic; rows_alpha shows whether any "
          f"growth is output-driven):")
    print(f"{'query':28s} {'t_lo':>7} {'t_hi':>7} {'alpha_t':>8} "
          f"{'MB_lo':>8} {'MB_hi':>8} {'alpha_B':>8} {'alpha_rows':>10}")
    ratio = math.log(hi / lo)
    for n in names:
        (tl, bl, rl), (th, bh, rh) = results[n][lo], results[n][hi]
        at = math.log(max(th, 1e-3) / max(tl, 1e-3)) / ratio
        ab = (math.log(max(bh, 1e-4) / max(bl, 1e-4)) / ratio) if bl or bh else 0.0
        ar = (math.log(max(rh, 1) / max(rl, 1)) / ratio) if rl or rh else 0.0
        print(f"{n:28s} {tl:7.2f} {th:7.2f} {at:8.2f} {bl:8.2f} {bh:8.2f} "
              f"{ab:8.2f} {ar:10.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""r10: the composed crawl→corpus pipeline (plans.crawl) — WARC response
shards through extraction, LID routing, CCNet tail drop, and curation."""

import pytest


@pytest.fixture()
def store(tmp_path):
    from incremental_datapipeline_using_snowflake_spark.operators import TableStore

    return TableStore(root=str(tmp_path / "store"))


def _seed_corpus(spark):
    rows = [
        (i, " ".join(f"seed{i}w{j}" for j in range(15)), "en", "seed", 90)
        for i in range(3)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_crawl_pipeline_end_to_end_manifest(spark, store, tmp_path):
    """Real WARC bytes through every stage: chrome-only pages and
    code-switched pages drop before curation (zero grams / unknown
    routing), per-language tail drops, planted exact/near dups resolve
    in-batch, and a replay run keeps nothing new."""
    from incremental_datapipeline_using_snowflake_spark.ops import curation as C
    from incremental_datapipeline_using_snowflake_spark.ops.text import train_char_lid
    from incremental_datapipeline_using_snowflake_spark.plans.crawl import (
        make_lid_seed,
        make_synthetic_crawl,
        run_crawl_pipeline,
    )

    crawl = tmp_path / "crawl"
    planted = make_synthetic_crawl(str(crawl), scale=1, n_shards=4)
    # r11: 400 unique (100 per language incl. the UNSPACED zh) + dups
    assert planted["n_records"] == 502

    C.bootstrap_corpus(spark, store, _seed_corpus(spark), "crawl.docs")
    # 4096 hashed features: at the default 256, cross-language gram
    # collisions left the clean/mixed margin distributions overlapping.
    # Thresholds are PER-LANGUAGE (r11, the CCNet calibration): under the
    # 4-class model clean ASCII pages measure >=876k ppg vs <=580k for
    # 50/50 code-switched pages — 700k sits between; zh's clean margins
    # sit structurally lower (an unspaced script has no space-anchored
    # high-evidence grams), so zh routes at a 20k floor — which no ASCII
    # page ever consults, since the threshold keys on the PREDICTED lang
    nf = 4096
    thr = {"default": 700_000, "zh": 20_000}
    model = train_char_lid(make_lid_seed(spark), n_features=nf)

    man = run_crawl_pipeline(
        spark, store, str(crawl), "crawl.docs", "c1", lid_model=model,
        lid_n_features=nf, min_margin_ppg=thr,
    )
    assert man["n_quarantined"] == 0
    assert man["n_docs"] == 502
    # unknown-routing absorbs the 15 code-switched pages and the 12
    # chrome-only pages (empty extraction -> zero grams -> no LID row);
    # every clean page — including all 118 unspaced zh pages — routes
    # confidently under the per-language thresholds
    assert man["n_lang_unknown"] == planted["n_mixed"] + planted["n_chrome_only"]
    # CCNet tail: one third per language of the labeled pages, ntile
    # remainders to the EARLIER buckets so tail gets the floor
    labeled = man["n_docs"] - man["n_lang_unknown"]
    assert labeled == 475
    assert man["n_tail_dropped"] == 157
    # curation sees labeled - tail docs; planted batch-internal dups show
    v = man["verdicts"]
    assert sum(v.values()) == labeled - man["n_tail_dropped"]
    assert v.get("exact_dup_batch", 0) > 0
    assert v.get("near_dup_batch", 0) > 0
    assert man["n_kept"] > 0
    assert man["n_corpus_after"] == 3 + man["n_kept"]

    # replay the same shards under a new run id: everything resolves as a
    # corpus dup (deterministic xxhash64 doc ids) — corpus unchanged
    man2 = run_crawl_pipeline(
        spark, store, str(crawl), "crawl.docs", "c2", lid_model=model,
        lid_n_features=nf, min_margin_ppg=thr,
    )
    assert man2["n_kept"] == 0
    assert man2["verdicts"].get("exact_dup_corpus", 0) > 0
    assert man2["n_corpus_after"] == man["n_corpus_after"]

"""Training-data text preparation: chunking, sequence packing, PII
redaction, TF-IDF ranking.

The standard steps between a cleaned corpus (ops/dedup.py, ops/text.py) and
a tokenizer at pretraining scale. Everything is Column-expression PySpark —
no Python UDFs — so the plans stay inside whole-stage codegen and every
operator has an exact DuckDB oracle twin:

- **chunking**: split documents into fixed-size overlapping token windows
  (context-length preparation). Narrow map + one controlled explode (the
  chunk count per doc), no shuffle.
- **packing**: assign documents to fixed token-budget bins (sequence
  packing for training efficiency). A per-shard running total over one
  window — packing is embarrassingly parallel across shards at scale, and
  a global packing order would single-partition the corpus.
- **PII redaction**: regex scrub of emails / phone numbers — narrow map.
- **TF-IDF**: per-document top terms. explode -> (doc,term) count ->
  document-frequency join -> per-doc top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .text import words_col

# retained for reference/tests; splitting now routes through the
# script-aware words_col (ops/text.py) so whitespace-free scripts
# (CJK/Thai) segment into real units instead of sentence-long "words"
WORD_RE = r"\s+"


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Overlapping token-window chunks per document.

    Emits (id, chunk_idx, chunk_tokens, chunk_fp) — the fingerprint stands
    in for the chunk text so downstream exact-dedup of chunks is already
    keyed. ``stride < chunk_tokens`` gives the standard overlap so no
    token span is split across a boundary without context.
    One explode whose fan-out is ceil(n_tokens/stride) — bounded and known
    per row; no shuffle.
    """
    # two-step Project: tokenize once, derive size + starts from the
    # pinned array (the words expression has 2 consumers here)
    pre = df.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_w")
    )
    n = F.size(F.col("_w"))
    # chunk starts: 0, stride, 2*stride, ... while start < n_tokens
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(int(stride))
    )
    out = pre.select(
        "id",
        "_w",
        F.explode(starts).alias("_start"),
    )
    chunk = F.slice(F.col("_w"), F.col("_start") + 1, int(chunk_tokens))
    return out.select(
        "id",
        # starts are exact multiples of stride, so idx = start/stride — the
        # same expression the SQL twin uses (no WITH ORDINALITY needed)
        (F.col("_start") / int(stride)).cast("long").alias("chunk_idx"),
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, bin) so every bin holds a contiguous
    run of documents whose token total fills ``budget_tokens``.

    Budget-quantized contiguous packing: within a shard (``id % n_shards``)
    documents are taken in id order and ``bin = floor(tokens_before /
    budget)`` — a document straddling a boundary belongs to the bin its
    first token falls in. This is the streaming form of greedy first-fit
    (identical bins whenever documents don't straddle; one-document skew
    when they do) and, unlike true first-fit, it is a pure window
    expression: no sequential driver loop, and shards pack independently —
    the shape that scales to a sharded corpus. One shuffle on the shard key.
    """
    words = words_col(F.col(text_col))
    toks = df.select(
        F.col(id_col).alias("id"),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(words).alias("n_tokens"),
    )
    w = W.partitionBy("shard").orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget_tokens).cast("long").alias("bin"),
    )



def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Length-bucketed dynamic batching — the padding-waste killer every
    training loader applies before collation: documents group into
    power-of-two length buckets, batches fill within a bucket, and each
    batch pads only to ITS max length instead of the global context.

    Determinism discipline: bucket = bit_length(n_tokens) - 1 computed
    via ``length(bin(n))`` (pure integer — a float log2 rounds
    differently across engines at exact powers of two); within-bucket
    order is the salted md5 of the id (stable across runs/partitionings,
    the epoch-shuffle discipline) with the id as total-order tiebreak;
    rows per batch = ``max(1, batch_tokens div 2^(bucket+1))`` — a
    per-bucket constant, so ``batch_idx`` is a plain integer division of
    the row_number.

    Scale shape: mirrors :func:`pack_sequences` — bucketing is a narrow
    map; the one shuffle keys on (shard, bucket) (shard = id % n_shards),
    so no bucket ever single-partitions the corpus and batches are
    independent per shard, which is how a sharded loader consumes them.

    Output: one row per (shard, bucket, batch_idx) with n_docs, tokens,
    batch_max (the pad target), padded = n_docs * batch_max, and
    waste_frac = 1 - tokens/padded rounded to 4 dp.
    """
    from .text import words_col as _wc

    n = F.size(_wc(F.col(text_col)))
    toks = df.select(
        F.col(id_col).alias("id"),
        (F.col(id_col) % n_shards).alias("shard"),
        n.alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    bucket = (F.length(F.bin(F.col("n_tokens"))) - 1).cast("int")
    key = F.conv(
        F.substring(F.md5(F.concat(F.lit("lenb:"), F.col("id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    b = toks.select("id", "shard", "n_tokens", bucket.alias("bucket"), key.alias("_k"))
    per_batch = F.greatest(
        F.lit(1).cast("long"),
        F.expr(
            f"cast({int(batch_tokens)} as bigint) div "
            "shiftleft(cast(1 as bigint), bucket + 1)"
        ),
    )
    w = W.partitionBy("shard", "bucket").orderBy(F.asc("_k"), F.asc("id"))
    seq = F.row_number().over(w)
    assigned = b.select(
        "shard",
        "bucket",
        "n_tokens",
        (((seq - 1) / per_batch).cast("long")).alias("batch_idx"),
    )
    agg = assigned.groupBy("shard", "bucket", "batch_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
        F.max("n_tokens").cast("long").alias("batch_max"),
    )
    return agg.select(
        "shard",
        "bucket",
        "batch_idx",
        "n_docs",
        "tokens",
        "batch_max",
        (F.col("n_docs") * F.col("batch_max")).alias("padded"),
        F.round(
            F.lit(1.0) - F.col("tokens") / (F.col("n_docs") * F.col("batch_max")), 4
        ).alias("waste_frac"),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d-]{7,}\d"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails and phone-number shapes, reporting per-doc counts.

    Narrow map (regexp_count + regexp_replace); emits the redacted text's
    fingerprint rather than the text so the result stays small. Redaction
    order matters for overlapping matches — emails first, then phones —
    and both engines apply the same order.
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    redacted1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phone = F.regexp_count(redacted1, F.lit(PHONE_RE))
    redacted = F.regexp_replace(redacted1, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("id"),
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


TOKEN_RE = "[a-z]{2,}"


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) (smoothed). Plan: one
    explode -> (doc, term) count (shuffle 1) -> term document-frequency
    aggregate (shuffle 2, term-keyed) joined back on term (AQE
    broadcast when the vocabulary is small, shuffle join when it isn't)
    -> per-doc top-k window (shuffle 3 on doc). The vocabulary join is the
    scale pressure point; a corpus-wide vocab is zipfian-small relative to
    the corpus, and the join key is the term so skew lands on stopwords —
    at 100 TB a min-df filter (df > 1 here) cuts the hapax tail.
    """
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()  # scalar-cache pattern (A2): one tiny agg, then a literal
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        "id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
            round_dp,
        ).alias("tfidf"),
    )
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("id", "rank", "term", "tf", "tfidf")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def _tf_col(words, term: str):
    return F.size(F.filter(words, lambda x: x == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a fixed term set under BM25 (Robertson/Sparck
    Jones probabilistic ranking; the +1-smoothed idf of Lucene).

    Plan shape (the reason this scales): per-term tf and doc length are a
    NARROW projection (array filter — no explode, no shuffle); the corpus
    statistics BM25 needs (N, avg doc length, per-term document frequency)
    are ONE tiny aggregate collapsed to literals via the scalar-cache
    pattern (A2); scoring is then a second narrow map and the only wide
    operation in the whole query is the global top-k (TakeOrdered — no
    full sort materialization). Two corpus scans total, zero joins.

    idf is rounded to 6 dp before scoring and scores to 4 dp, pinning the
    float trajectory so the DuckDB oracle replays it bit-identically.
    """
    import math

    # materialize the words array ONCE (two-step Project): with 1 + n_terms
    # consumers, an inline expression would tokenize the text per consumer
    # — CollapseProject keeps the split un-inlined because it is used more
    # than once, which matters now that words_col carries the segmentation
    # guard (r11: bm25 measured 2.8x its baseline with per-term re-splits)
    base = df.select(F.col(id_col), words_col(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    base = base.select(
        F.col(id_col),
        F.size(w).alias("dl"),
        # _tf_col captures the term in a closure: an inline `lambda x, t=t`
        # would present arity 2 to F.filter, which then binds t to the
        # element INDEX, not the term.
        *[_tf_col(w, t).alias(f"tf_{t}") for t in terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    ).first()
    n = stats["n"]
    avgdl = stats["sum_dl"] / n  # int/int -> same double as DuckDB's CAST/count
    score = F.lit(0.0)
    for t in terms:
        idf = round(math.log((n - stats[f"df_{t}"] + 0.5) / (stats[f"df_{t}"] + 0.5) + 1), 6)
        tf = F.col(f"tf_{t}")
        score = score + (
            F.lit(idf) * tf * F.lit(k1 + 1)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
        )
    return (
        base.select(id_col, *[f"tf_{t}" for t in terms], F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of named
    ranked lists — the standard hybrid-retrieval combiner (BM25 lexical +
    dense semantic is the canonical pair): ``score(d) = Σ_lists
    1/(k0 + rank_list(d))``, documents absent from a list contribute
    nothing from it. Rank-based, so the lists' score scales never need
    calibration — the reason RRF beats score interpolation in practice.

    Each input frame carries ``(id_col, rank)`` with 1-based ranks.
    Returns ``(id_col, rrf, n_lists, rank)`` ordered by fused score
    (6-dp rounded; with two lists the two-term sum is order-exact, so a
    SQL oracle replays it bit-identically — more lists can differ in the
    last ulp before rounding).

    Scale shape: inputs are ALREADY top-k lists (bounded — Σk rows
    total), so the union + groupBy + the single-partition rank window are
    all on k-sized data regardless of corpus size; the heavy lifting
    happened in the per-list retrieval ops.
    """
    from functools import reduce

    from pyspark.sql import Window as W

    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranked list")
    parts = [
        df.select(F.col(id_col), F.col("rank").cast("long").alias("rank"))
        for df in rankings.values()
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k0) + F.col("rank"))), 6).alias("rrf"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = W.orderBy(F.desc("rrf"), F.asc(id_col))
    out = fused.withColumn("rank", F.row_number().over(w))
    if top is not None:
        out = out.filter(F.col("rank") <= top)
    return out


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 30,
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies — the statistic the
    first BPE merge maximizes (tokenizer induction primitive). Pairs are
    counted within words, weighted by word occurrences (every occurrence
    votes, as in the BPE corpus count).

    Scale shape: two narrow explodes (words, then the per-word pair list
    built by one `transform` over substr positions — no char-array
    materialization), one groupBy(pair) with map-side partial counts, and
    a TakeOrdered top-k.

    Output: (pair, n) ordered by n desc, pair asc.
    """
    words = df.select(
        F.explode(words_col(F.col(text_col))).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top)
    )


# ---------------------------------------------------------------------------
# Hashing-vectorizer text similarity (r06): documents → sparse signed-hash
# vectors → cosine kNN, with no model and no dense arrays. The sparse
# (doc, component, weight) relation IS the vector representation — the
# right 100 TB shape, since hash components per doc are bounded by the
# doc's vocabulary, not the embedding dimension.


def sparse_hash_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Signed feature-hashing doc vectors in sparse form: component
    ``j = md5(w) % dim``, sign from an independent salted hash, weight =
    signed term count. One explode + one (doc, j)-keyed aggregation; all
    integer arithmetic, engine-portable.

    Returns ``id_col, j, val`` (val = Σ ±1 over the doc's tokens hashing
    to j; zero-sum components drop out naturally — they contribute
    nothing to dot products).
    """
    from ..queries.util import md5_long

    words = F.filter(
        words_col(F.lower(F.col(text_col))),
        lambda w: F.length(w) > 0,
    )
    toks = df.select(F.col(id_col), F.explode(words).alias("_w"))
    j = md5_long(F.col("_w")) % F.lit(dim)
    sgn = F.when(
        md5_long(F.concat(F.lit("sgn:"), F.col("_w"))) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), j.alias("j"), sgn.alias("_s"))
        .groupBy(id_col, "j")
        .agg(F.sum("_s").alias("val"))
        .filter(F.col("val") != 0)
    )


def text_knn(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Model-free text kNN: cosine top-k over :func:`sparse_hash_vectors`.

    Plan: the probe slice of the sparse relation broadcasts; dot products
    are ONE join on the hash component followed by a (probe, doc) sum —
    integer-exact until the final ``dot / (√na·√nb)`` division; norms are
    a per-doc sum of squares. No dense vectors are ever materialized and
    nothing quadratic runs: cost ∝ corpus sparse size × probe count.

    Output: ``query_id, rank, nbr_id, cosine`` (cosine rounded to 6 dp,
    nbr_id tie-break).
    """
    v = sparse_hash_vectors(df, text_col, id_col, dim)
    norms = v.groupBy(id_col).agg(F.sum(F.col("val") * F.col("val")).alias("n2"))
    probes = v.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("query_id"), "j", F.col("val").alias("pval")
    )
    dots = (
        v.join(F.broadcast(probes), "j")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("val") * F.col("pval")).alias("dot"))
    )
    pn = norms.select(F.col(id_col).alias("query_id"), F.col("n2").alias("pn2"))
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(pn), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("nbr_id"),
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("n2").cast("double")) * F.sqrt(F.col("pn2").cast("double"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    min_len: int = 2,
) -> DataFrame:
    """Iterative BPE merge training (Sennrich et al. 2016) — the tokenizer
    induction loop itself, extending the single-step argmax statistic of
    :func:`bpe_pair_counts` to ``n_merges`` rounds.

    Scale shape — the key trick is WHAT iterates: the corpus is scanned
    ONCE into the distinct-word count relation (vocab-bounded — at 100 TB
    the corpus is ~10^11 docs but the vocabulary plateaus around 10^7
    words, a 4-order-of-magnitude reduction), and every merge round then
    runs on that small relation only: one explode→groupBy for weighted
    pair counts (map-side partial aggregation), a 1-row argmax collect
    (deterministic tiebreak: count desc, left asc, right asc — both
    engines sort identically), and one ``aggregate`` fold applying the
    merge greedily left-to-right inside each word's token array (exact
    BPE semantics: 'aaa' + merge(a,a) → [aa, a]). ``localCheckpoint``
    per round truncates the lineage, the k-means / PageRank iterative
    discipline.

    Returns the merge table ``(merge_rank, lhs, rhs, merged, n)`` — what
    a tokenizer build consumes (lhs/rhs, not left/right: the oracle twin
    would otherwise need quoted SQL keywords in every engine).
    """
    words = (
        df.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "c",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.substring(F.col("w"), i, F.lit(1)),
            ).alias("toks"),
        )
        .localCheckpoint(eager=False)
    )

    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pair_counts = (
            words.filter(F.size("toks") >= 2)
            .select(
                "c",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("l"),
                            F.element_at("toks", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("c").alias("n"))
        )
        top = pair_counts.orderBy(
            F.desc("n"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not top:
            break
        a, b, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((rank, a, b, a + b, n))
        la, lb = F.lit(a), F.lit(b)
        words = words.select(
            "c",
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, t: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (t == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(la, lb)),
                    ),
                ).otherwise(F.concat(acc, F.array(t))),
            ).alias("toks"),
        ).localCheckpoint(eager=False)

    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, merged string, n long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge sequence (:func:`bpe_train` output, in
    rank order) to tokenize documents — the OTHER half of the tokenizer
    loop, and the one that runs at full corpus scale on every training
    refresh.

    Scale shape mirrors training: the merge folds run on the DISTINCT
    word relation only (vocab-bounded; merges are driver-side literals —
    k pairs, no collect, no join per round), then each document
    reassembles its token stream with one word-join and one doc-keyed
    aggregation — ``sort_array(collect_list(struct(pos, toks)))`` keeps
    word order exact under any partitioning. Emits
    ``(id_col, n_tokens, tokens_fp)`` — the count a packing/budget stage
    consumes plus an md5 fingerprint of the space-joined token stream
    (tokens never contain spaces) so correctness is checkable without
    shipping token arrays around.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "w"),
    ).filter(F.col("w") != "")
    dw = words.select("w").distinct().select(
        "w",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.substring(F.col("w"), i, F.lit(1)),
        ).alias("toks"),
    )
    for a, b in merges:
        la, lb = F.lit(a), F.lit(b)
        dw = dw.select(
            "w",
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, t: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (t == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(la, lb)),
                    ),
                ).otherwise(F.concat(acc, F.array(t))),
            ).alias("toks"),
        )
    joined = words.join(dw, "w")
    stream = F.flatten(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "toks"))),
            lambda x: x["toks"],
        )
    )
    return joined.groupBy(id_col).agg(
        F.size(stream).cast("long").alias("n_tokens"),
        F.md5(F.array_join(stream, " ")).alias("tokens_fp"),
    )


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index — the lexical-retrieval analogue of the IVF
# index lifecycle (ops/similarity.py:build_ivf_index): build once into the
# TableStore, query many times with partition-pruned postings scans, grow
# incrementally at batch cost. bm25_topk rescans the corpus per query set;
# at warehouse scale the index is how lexical search actually runs.
# ---------------------------------------------------------------------------
BM25_BUCKETS = 32  # term-hash partition fanout for postings pruning


def _bm25_bucket(term: Column) -> Column:
    from ..queries.util import md5_long as _md5

    return (_md5(term) % BM25_BUCKETS).cast("int")


def build_bm25_index(
    spark,
    store,
    df: DataFrame,
    name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the inverted index: ``<name>__postings`` (bucket, term,
    doc_id, tf) Hive-partitioned on the term-hash bucket so a query's
    postings scan prunes to the probed terms' partitions; ``<name>__docs``
    (doc_id, dl) lengths; ``<name>__stats`` the (n_docs, sum_dl) scalar
    pair. Document frequency is NOT a stored statistic — it is derived
    from the pruned postings at query time, so appends can never leave a
    stale idf (the same freshness-by-construction choice the curation
    store makes for its Bloom delta)."""
    words = words_col(F.col(text_col))
    tokens = df.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    postings = (
        tokens.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select(_bm25_bucket(F.col("term")).alias("bucket"), "term", "doc_id", "tf")
    )
    store.overwrite(postings, f"{name}__postings", partition_by=["bucket"])
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.size(words).cast("long").alias("dl")
    )
    store.overwrite(docs, f"{name}__docs")
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    store.overwrite(stats, f"{name}__stats")


def append_to_bm25_index(
    spark,
    store,
    batch: DataFrame,
    name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Grow the index by one batch: postings/lengths append at batch cost
    (no corpus rescan of payloads), the scalar stats pair updates by
    exact integer addition — after any append sequence over doc_ids not
    yet in the index the result answers queries byte-identically to a
    from-scratch build over the union (pinned by the
    ``bm25_index_lifecycle`` oracle).

    Replay guard: a doc_id already present in ``<name>__docs`` is
    silently skipped (broadcast anti-join of the batch against the
    stored id column — ids only, payloads never rescanned), so
    re-delivering a batch is idempotent instead of fanning out the
    query join / double-counting dl and stats. Within one batch,
    ``id_col`` must be unique — that is the caller's ingest contract
    (the same precondition ``build_bm25_index`` has)."""
    # already-indexed ids in this batch: stream the stored id column once
    # against the broadcast batch ids (big side never shuffles), then
    # anti-join the (small) hit set back out of the batch
    existing = store.read(spark, f"{name}__docs").select("doc_id")
    already = existing.join(
        F.broadcast(batch.select(F.col(id_col).alias("doc_id"))), "doc_id", "left_semi"
    ).withColumnRenamed("doc_id", id_col)
    batch = batch.join(F.broadcast(already), id_col, "left_anti")
    words = words_col(F.col(text_col))
    tokens = batch.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    postings = (
        tokens.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select(_bm25_bucket(F.col("term")).alias("bucket"), "term", "doc_id", "tf")
    )
    store.append(postings, f"{name}__postings", partition_by=["bucket"])
    docs = batch.select(
        F.col(id_col).alias("doc_id"), F.size(words).cast("long").alias("dl")
    )
    store.append(docs, f"{name}__docs")
    old = store.read(spark, f"{name}__stats").first()
    add = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # a fully-replayed (= fully-filtered) batch sums to NULL, adds 0
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("s"),
    ).first()
    new_stats = spark.createDataFrame(
        [(old["n_docs"] + add["n"], old["sum_dl"] + add["s"])],
        schema="n_docs long, sum_dl long",
    )
    store.overwrite(new_stats, f"{name}__stats")


def query_bm25_index(
    spark,
    store,
    name: str,
    terms: list[str],
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Answer a BM25 top-k from the STORED index: one 1-row stats read,
    one postings scan partition-pruned to the probed terms' buckets
    (cost ∝ those terms' postings, never the corpus), df derived exactly
    from the pruned postings, then the IDENTICAL literal-arithmetic
    scoring chain as :func:`bm25_topk` (same association order, same
    6 dp idf / 4 dp score rounding) over the matched docs only — a doc
    with no query term scores 0 in both paths and appears in neither."""
    import math

    st = store.read(spark, f"{name}__stats").first()
    n, avgdl = st["n_docs"], st["sum_dl"] / st["n_docs"]
    # partition pruning: a literal IN on the partition column reaches the
    # directory listing (only the probed terms' bucket dirs are read),
    # then the exact term filter cuts hash-sharing neighbors
    bucket_lits = sorted({_portable_bucket(t) for t in terms})
    posts = store.read(spark, f"{name}__postings").filter(
        F.col("bucket").isin(*bucket_lits) & F.col("term").isin(*terms)
    )
    per_doc = posts.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0))
            .cast("long")
            .alias(f"tf_{t}")
            for t in terms
        ]
    )
    dfs = {
        r["term"]: r["df"]
        for r in posts.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    dl = store.read(spark, f"{name}__docs")
    base = per_doc.join(dl, "doc_id")
    score = F.lit(0.0)
    for t in terms:
        df_t = dfs.get(t, 0)
        idf = round(math.log((n - df_t + 0.5) / (df_t + 0.5) + 1), 6)
        tf = F.col(f"tf_{t}")
        score = score + (
            F.lit(idf) * tf * F.lit(k1 + 1)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
        )
    return (
        base.select("doc_id", *[f"tf_{t}" for t in terms], F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def _portable_bucket(term: str) -> int:
    """Driver-side twin of :func:`_bm25_bucket` (same md5-long % buckets)."""
    import hashlib

    h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
    return h % BM25_BUCKETS


# ---------------------------------------------------------------------------
# Span corruption — the T5 denoising objective's data transform (Raffel et
# al. 2020 §3.1.4): mask ~15% of tokens in multi-token spans, emit the
# sentinel-marked input and the sentinel+masked-tokens target. At corpus
# scale this runs on every pretraining refresh, so it must be a row-local
# Column pipeline, deterministic (salted hash, not RNG — re-runs and the
# SQL oracle reproduce byte-identical pairs), and explode-free.
# ---------------------------------------------------------------------------
SPAN_NOISE_MOD = 20  # a span STARTS at position i iff hash(id:i) % 20 == 0
SPAN_LEN = 3         # each start masks 3 tokens (~15% noise density)


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    noise_mod: int = SPAN_NOISE_MOD,
    span_len: int = SPAN_LEN,
) -> DataFrame:
    """Deterministic T5 span corruption: position ``i`` starts a masked
    span iff ``md5(id:i) % noise_mod == 0``; spans cover ``span_len``
    tokens and overlapping spans merge into one run. The input keeps
    unmasked tokens with one ``<extra_id_k>`` sentinel per run; the
    target is each run's sentinel followed by its masked tokens —
    exactly the pair a T5-style trainer consumes.

    Everything is row-local array arithmetic over bound lambda variables
    (the winnowing lesson: never reference a transform subtree inside
    another lambda — bind it once through a 1-element array). Output
    carries md5 fingerprints of both streams plus the count columns, so
    correctness is checkable without shipping token arrays.
    """
    from ..queries.util import md5_long

    w = words_col(F.col(text_col))
    idc = F.col(id_col)

    def _fp(i: Column) -> Column:
        return md5_long(F.concat(idc.cast("string"), F.lit(":"), i.cast("string")))

    def build(ww: Column) -> Column:
        m = F.size(ww)
        idx = F.sequence(F.lit(0), m - 1)
        starts = F.transform(idx, lambda i: (_fp(i) % noise_mod) == 0)

        def with_starts(st: Column) -> Column:
            masked = F.transform(
                F.sequence(F.lit(0), F.size(st) - 1),
                lambda i: F.exists(
                    F.slice(
                        st,
                        F.greatest(i - span_len + 2, F.lit(1)),
                        F.least(i + 1, F.lit(span_len)),
                    ),
                    lambda x: x,
                ),
            )

            def with_masked(mk: Column) -> Column:
                # element_at(mk, 0) would throw (no boolean short-circuit in
                # SQL): clamp the predecessor index to 1 — the i==0 arm of
                # the OR makes the clamped read's value irrelevant there
                run_start = F.transform(
                    F.sequence(F.lit(0), F.size(mk) - 1),
                    lambda i: F.element_at(mk, i + 1)
                    & ((i == 0) | ~F.element_at(mk, F.greatest(i, F.lit(1)))),
                )

                def with_runs(rs: Column) -> Column:
                    # k_i = index of the run containing/preceding position i
                    # (1-based count of run starts in positions 0..i)
                    kcum = F.transform(
                        F.sequence(F.lit(0), F.size(rs) - 1),
                        lambda i: F.size(
                            F.filter(F.slice(rs, 1, i + 1), lambda x: x)
                        ),
                    )

                    def with_k(kc: Column) -> Column:
                        sent = lambda i: F.concat(  # noqa: E731
                            F.lit("<extra_id_"),
                            (F.element_at(kc, i + 1) - 1).cast("string"),
                            F.lit(">"),
                        )
                        inp = F.flatten(
                            F.transform(
                                F.sequence(F.lit(0), F.size(kc) - 1),
                                lambda i: F.when(
                                    ~F.element_at(mk, i + 1),
                                    F.array(F.element_at(ww, i + 1)),
                                )
                                .when(
                                    F.element_at(rs, i + 1), F.array(sent(i))
                                )
                                .otherwise(F.array().cast("array<string>")),
                            )
                        )
                        tgt = F.flatten(
                            F.transform(
                                F.sequence(F.lit(0), F.size(kc) - 1),
                                lambda i: F.when(
                                    F.element_at(rs, i + 1),
                                    F.array(sent(i), F.element_at(ww, i + 1)),
                                )
                                .when(
                                    F.element_at(mk, i + 1),
                                    F.array(F.element_at(ww, i + 1)),
                                )
                                .otherwise(F.array().cast("array<string>")),
                            )
                        )
                        return F.struct(
                            F.size(F.filter(mk, lambda x: x)).alias("n_masked"),
                            F.size(F.filter(rs, lambda x: x)).alias("n_spans"),
                            F.md5(F.array_join(inp, " ")).alias("input_fp"),
                            F.md5(F.array_join(tgt, " ")).alias("target_fp"),
                        )

                    return F.element_at(F.transform(F.array(kcum), with_k), 1)

                return F.element_at(F.transform(F.array(run_start), with_runs), 1)

            return F.element_at(F.transform(F.array(masked), with_masked), 1)

        return F.element_at(F.transform(F.array(starts), with_starts), 1)

    built = F.element_at(F.transform(F.array(w), build), 1)
    return df.select(
        idc, F.size(w).alias("n_tokens"), built.alias("_b")
    ).select(
        id_col,
        "n_tokens",
        F.col("_b.n_masked").alias("n_masked"),
        F.col("_b.n_spans").alias("n_spans"),
        F.col("_b.input_fp").alias("input_fp"),
        F.col("_b.target_fp").alias("target_fp"),
    )

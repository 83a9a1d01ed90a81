"""Deduplication operators for large-scale corpus pipelines.

North-star additions (SURVEY.md §2.8) with no reference counterpart
(the reference's only dedup is ``drop_duplicates`` on mesh node ids,
``_gui.py:780``).  Design rules for 100 TB:

- **exact / fingerprint dedup** is a hash groupBy on the dedup key —
  one shuffle, map-side partial aggregation, no Python;
- **MinHash** signatures are computed per-row with higher-order
  functions (``transform`` + ``array_min`` over the token array —
  no explode, no shuffle); only the b band keys per document are
  exploded for the LSH self-join, so the join input is O(b·n) tiny
  rows instead of O(n²) pairs;
- **SimHash** is per-row bit arithmetic over word hashes;
- every hash is md5-derived so the same signatures are computable in
  ANSI SQL (the DuckDB oracle runs the identical algorithm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.text import normalize_text, tokens


def exact_dedup(df: DataFrame, key_cols, id_col: str) -> DataFrame:
    """Exact dedup: one surviving row (min id) per distinct key, with the
    duplicate count — ``groupBy(key).agg(min(id))``, a single shuffle."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def drop_exact_dups(df: DataFrame, key_cols) -> DataFrame:
    """``dropDuplicates`` passthrough (the reference's dedup primitive)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return df.dropDuplicates(key_cols)


def _word_hash(word: Column, seed, hex_digits: int = 8) -> Column:
    """Hash of a word under a seed: first ``hex_digits`` hex digits of
    md5('<seed>_<word>') (8 -> 32 bits; up to 15 -> 60 bits, the widest
    that stays inside a signed BIGINT on both engines).  md5 so the SQL
    oracle reproduces it exactly; use xxhash64 instead when oracle
    parity is not needed (faster)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}_"), word)), 1, hex_digits),
        16,
        10,
    ).cast("long")


def _token_set(text: Column, ngrams: int) -> Column:
    """The MinHash item set: distinct tokens (``ngrams=1``) or word
    shingles (``ngrams>1`` — the right choice when the vocabulary is
    small relative to document length, where every doc contains nearly
    every word and unigram signatures degenerate)."""
    if ngrams > 1:
        from vtk_reserves_spark.functions.text import shingles

        return shingles(text, ngrams)
    return F.array_distinct(tokens(normalize_text(text)))


#: MinHash permutation modulus: smallest prime > 2^32, so (a·h+b) mod P
#: is a universal hash over the 32-bit base-hash domain and a·h < 2^62
#: never overflows a signed 64-bit integer (a < 2^31, h < 2^32).
MINHASH_P = 4294967311


def minhash_perm_consts(k: int, seed: str) -> list[tuple[int, int]]:
    """Deterministic (a, b) constants for the k MinHash permutations,
    derived from md5 of the seed at plan-build time — the same literals
    are inlined into the Spark expression and the SQL oracle, so both
    engines compute identical signatures with zero runtime seed-hashing."""
    import hashlib

    out = []
    for s in range(k):
        a = int(hashlib.md5(f"{seed}a{s}".encode()).hexdigest()[:8], 16)
        b = int(hashlib.md5(f"{seed}b{s}".encode()).hexdigest()[:8], 16)
        out.append((a % (2**31 - 1) + 1, b % MINHASH_P))
    return out


def _base_hash(word: Column) -> Column:
    """32-bit base hash of an item: first 8 hex digits of md5(item).
    md5 so the SQL oracle reproduces it exactly."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")


def _perm_lambda(a: int, b: int):
    # NB: the lambda must take exactly one arg — F.transform treats a
    # second parameter as the element index
    return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)


def _sig_of_hashes(hashes: Column, k: int, seed: str) -> Column:
    """k-permutation MinHash signature over a MATERIALIZED base-hash
    array column: k passes of cheap arithmetic min — no digests here.
    ``hashes`` must be a bound attribute (its own projection), else each
    of the k passes re-evaluates the upstream md5 transform."""
    return F.array(
        *[
            F.array_min(F.transform(hashes, _perm_lambda(a, b)))
            for a, b in minhash_perm_consts(k, seed)
        ]
    )


def _sig_of_items(items: Column, k: int, seed: str) -> Column:
    """k-permutation MinHash signature over an item-array column.

    One md5 per item (the base hash), then k arithmetic permutations
    (a·h + b) mod P — k× fewer digest computations than hashing every
    item under every seed, with the same collision semantics (each
    permutation is a universal hash of the base).  Single-expression
    convenience form: the base-hash pass is evaluated k times (once per
    outer transform); hot paths stage the base array in its own
    projection and use ``_sig_of_hashes`` (see minhash_lsh_pairs)."""
    return _sig_of_hashes(F.transform(items, _base_hash), k, seed)


def minhash_signature(
    text: Column, k: int = 8, seed: str = "mh", ngrams: int = 1
) -> Column:
    """Single-expression MinHash signature: array of k longs.

    Convenient for small inputs; in hot paths materialize the item set
    first (lambda bodies re-evaluate outer subtrees per element, so this
    form re-tokenizes the text k× per item — see minhash_lsh_pairs)."""
    return _sig_of_items(_token_set(text, ngrams), k, seed)


def with_minhash(
    df: DataFrame,
    text_col: str,
    k: int = 8,
    seed: str = "mh",
    out_col: str = "minhash",
    ngrams: int = 1,
) -> DataFrame:
    """Staged signature computation (the hot-path form): item set and
    base-hash array each get their own projection, so the md5 pass runs
    once per row and the k permutation passes are pure arithmetic."""
    staged = df.withColumn(
        "_mh_h", F.transform(_token_set(F.col(text_col), ngrams), _base_hash)
    )
    return staged.withColumn(out_col, _sig_of_hashes(F.col("_mh_h"), k, seed)).drop(
        "_mh_h"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    seed: str = "mh",
    ngrams: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Signature of k hashes split into ``bands`` bands of k/bands rows;
    documents sharing any full band collide.  Plan shape: per-row
    signature -> explode to (id, band_id, band_key) -> self-join on the
    band key -> distinct (id_a < id_b) pairs.  The join key space is
    b · n rows; with a sane band width the bucket sizes stay small, so
    the shuffle is linear in the corpus, never quadratic.

    Each stage (tokens -> items -> signature -> band keys) is its own
    projection with the upstream column referenced multiple times — that
    blocks CollapseProject from re-inlining the expression into
    downstream lambdas, where interpreted higher-order functions would
    re-evaluate it per element (measured: the single-expression form is
    ~1000× slower per row at k=8, bands=4, ngrams=3)."""
    if bands > k or k % bands != 0:
        # bands > k would make every band key the EMPTY slice — all
        # documents collide into one O(n²) bucket; a non-divisor would
        # silently ignore the k % bands trailing hashes
        raise ValueError(
            f"bands ({bands}) must evenly divide the signature size k ({k})"
        )
    r = k // bands
    if ngrams > 1:
        from vtk_reserves_spark.functions.text import shingles_of_tokens

        items_df = df.select(
            F.col(id_col).alias("doc"),
            tokens(normalize_text(F.col(text_col))).alias("_t"),
        ).select("doc", shingles_of_tokens(F.col("_t"), ngrams).alias("_items"))
    else:
        items_df = df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(tokens(normalize_text(F.col(text_col)))).alias("_items"),
        )
    hash_df = items_df.select(
        "doc", F.transform(F.col("_items"), _base_hash).alias("_h")
    )
    sig_df = hash_df.select(
        "doc", _sig_of_hashes(F.col("_h"), k, seed).alias("_sig")
    )
    # band structs built by unrolled F.array (bands textual refs to _sig,
    # not a transform lambda) — keeps _sig materialized, no per-band re-eval
    bandarr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(F.slice(F.col("_sig"), b * r + 1, r), "_").alias("key"),
            )
            for b in range(bands)
        ]
    )
    keyed = sig_df.select("doc", F.explode(bandarr).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # bucket-then-pair instead of a self-join: signatures are computed
    # once (a self-join recomputes the whole upstream on each side) and
    # there is ONE shuffle (the groupBy) instead of two.  After the agg,
    # `ds` is a bound attribute, so the nested pair-generation lambdas
    # capture it for free.  Pair count is sum(|bucket|²) — linear in the
    # corpus when band keys discriminate.
    buckets = (
        keyed.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    if max_bucket is not None:
        # skew escape hatch (SCALE.md): a degenerate band key (e.g. a
        # boilerplate-dominated corpus) makes one bucket O(n) and its
        # pair list O(n²).  Dropping buckets over the cap bounds the
        # worst case; members of a dropped bucket still pair through
        # their other (bands-1) band keys unless they collide everywhere
        # — in which case the band parameters, not the cap, are wrong.
        buckets = buckets.where(F.size("ds") <= max_bucket)
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def duplicate_clusters(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair graph: assign every
    node the minimum id reachable through the pairs — the canonical
    final step of near-dedup (LSH emits *pairs*; keeping one document
    per *cluster* requires the transitive closure, else A~B and B~C with
    A kept and B dropped still leaves C).

    ``pairs`` is an (id_a, id_b) frame (e.g. :func:`minhash_lsh_pairs`);
    ``nodes`` optionally supplies the full corpus id set so singletons
    appear with ``cluster = id`` (pass the corpus ids — a dedup that
    silently drops untouched documents is wrong).

    Algorithm: iterative min-label propagation (hash-to-min).  Each
    round every node takes the min of its own label and its neighbors'
    labels — one shuffle per round (join on src + groupBy dst), each a
    hash partitioning on the same id domain, so AQE coalesces and
    co-partitions them.  Converges in O(graph diameter) rounds; LSH
    duplicate clusters are unions of bucket cliques with tiny diameter
    (2–3), so 3–4 rounds in practice at any corpus size — this is the
    regime where hash-to-min beats large-star/small-star (which wins
    only on long-chain graphs that near-dup candidate graphs are not).

    Plan + memory discipline (both matter for an iterative operator):
    ``labels`` feeds each round TWICE (the neighbor join and the merge
    join), so without lineage truncation the logical plan doubles per
    round — exponential, and analysis alone OOMs by round ~10.  Each
    round is therefore eagerly localCheckpoint()ed, which replaces the
    plan with a flat scan of the materialized blocks.  But checkpoint
    blocks are only freed by the ContextCleaner after the Python
    DataFrame is garbage-collected, which py4j defers unboundedly — a
    long-lived session (the bench runs 50+ queries in one JVM) degrades
    measurably from the leak (observed ~2× on every subsequent query).
    So each checkpoint's newly-persisted RDD ids are tracked via
    ``getPersistentRDDs`` and the PREVIOUS round's blocks are
    explicitly unpersisted once the next round has materialized:
    bounded at two rounds + edges live at any time.  Retired rounds'
    blocks sit on MEMORY_AND_DISK, so dropping them is safe — the
    standard periodic-checkpoint-and-release pattern of iterative
    graph algorithms (GraphX/GraphFrames do the same).  The FINAL
    round's blocks ARE the result (truncated lineage) and stay live;
    long-lived callers should unpersist the result when done.
    """
    sc = pairs.sparkSession.sparkContext

    def persistent_ids() -> set[int]:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def unpersist_ids(ids: set[int]) -> None:
        m = sc._jsc.getPersistentRDDs()
        for i in ids:
            r = m.get(i)
            if r is not None:
                r.unpersist(False)

    def ckpt(df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = persistent_ids()
        out = df.localCheckpoint(eager=True)
        return out, persistent_ids() - before

    e = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges, edge_ids = ckpt(e.distinct())

    if nodes is not None:
        labels = nodes.select(F.col(id_col).alias("id")).distinct()
    else:
        labels = edges.select(F.col("src").alias("id")).distinct()
    labels, label_ids = ckpt(labels.select("id", F.col("id").alias("lbl")))

    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nlbl"))
        )
        merged, merged_ids = ckpt(
            labels.join(prop, labels.id == prop.dst, "left").select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.col("nlbl").isNotNull() & (F.col("nlbl") < F.col("lbl"))).alias(
                    "_chg"
                ),
            )
        )
        changed = merged.where("_chg").count()
        unpersist_ids(label_ids)
        labels, label_ids = merged.drop("_chg"), merged_ids
        if changed == 0:
            break
    unpersist_ids(edge_ids)
    return labels.select(F.col("id").alias(id_col), F.col("lbl").alias("cluster"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngrams: int = 3,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash the word
    ``ngrams``-grams in document order, slide a ``window`` over the hash
    sequence, keep the minimum of each window, return the distinct
    selected hashes as (id, fp) rows.

    Guarantees: any shared run of ``window + ngrams - 1`` words between
    two documents contributes at least one identical fingerprint, so
    fingerprint overlap detects partial/local duplication that whole-doc
    hashes (``functions.text.fingerprint``) miss and set-level MinHash
    only sees proportionally.

    Plan shape (same staging discipline as minhash_lsh_pairs — each
    expensive array is its own projection): tokens → ordered gram
    hashes (one md5 per gram) → window minima (pure arithmetic) →
    explode distinct.  Per-row work is O(tokens · window); no shuffle
    until the final distinct, which is one hash aggregation on (id, fp)
    — linear in the corpus at any scale.  Short documents (< window
    grams) fall back to the global minimum hash; empty token lists hash
    the empty string."""
    from vtk_reserves_spark.functions.text import ordered_shingles_of_tokens

    tok_df = df.select(
        F.col(id_col).alias("doc"),
        tokens(normalize_text(F.col(text_col))).alias("_t"),
    )
    gram_df = tok_df.select(
        "doc",
        F.when(
            F.size("_t") >= ngrams,
            ordered_shingles_of_tokens(F.col("_t"), ngrams),
        )
        .otherwise(F.array(F.array_join(F.col("_t"), " ")))
        .alias("_g"),
    )
    hash_df = gram_df.select(
        "doc", F.transform(F.col("_g"), _base_hash).alias("_h")
    )
    nwin = F.size("_h") - (window - 1)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("_h"), i, window)),
    )
    fp_df = hash_df.select(
        "doc",
        F.when(nwin > 0, F.array_distinct(wins))
        .otherwise(F.array(F.array_min(F.col("_h"))))
        .alias("_fps"),
    )
    # explode_outer, not explode: Catalyst infers a `size(_fps) > 0`
    # filter under a non-outer Generate and pushes it below the staged
    # projections, re-inlining the whole token→gram→hash→window pipeline
    # into one interpreted predicate per row (measured: unrunnable at
    # sf0.1).  `_fps` is never empty (short-text fallback), so the outer
    # variant is semantically identical and keeps the staging intact.
    return fp_df.select(
        F.col("doc").alias(id_col), F.explode_outer("_fps").alias("fp")
    ).distinct()


def decontaminate_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngrams: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that contain any
    word ``ngrams``-gram appearing in the benchmark set, with the count
    of distinct contaminated grams per document.

    The standard LLM-training hygiene step (e.g. GPT-3 appendix C /
    Dolma): exact n-gram overlap against held-out evaluation data.
    Plan: both sides tokenize -> distinct gram hashes; the benchmark
    side (small by construction) deduplicates to one row per gram and
    BROADCASTS; the corpus side explodes its grams and inner-joins the
    broadcast set — no shuffle touches the corpus until the final
    per-document count (one hash aggregation).  Returns only
    contaminated documents: ``(id, n_hits)``.
    """
    from vtk_reserves_spark.functions.text import shingles_of_tokens

    def gram_hashes(df: DataFrame, out: str) -> DataFrame:
        t = df.select(
            F.col(id_col).alias("_id"),
            tokens(normalize_text(F.col(text_col))).alias("_t"),
        )
        g = t.select("_id", shingles_of_tokens(F.col("_t"), ngrams).alias("_g"))
        h = g.select("_id", F.transform(F.col("_g"), _base_hash).alias("_h"))
        return h.select("_id", F.explode_outer("_h").alias(out))

    bench_grams = gram_hashes(benchmark, "gram").select("gram").distinct()
    corpus_grams = gram_hashes(corpus, "gram")
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.groupBy("_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
        .select(F.col("_id").alias(id_col), "n_hits")
    )


def build_bloom_bits(
    benchmark: DataFrame,
    text_col: str,
    ngrams: int = 5,
    m_bits: int = 8192,
    k_hashes: int = 2,
) -> list[int]:
    """Driver-side build of a Bloom filter over the benchmark's word
    n-grams: ``m_bits`` bits packed into ``m_bits/64`` signed longs.

    Bit positions are md5-derived with a per-hash salt
    (``md5(gram || '_bf<j>') % m_bits``) so ANY engine reproduces them
    — the filter's false positives are deterministic, which is what
    lets an SQL oracle replay membership exactly.  The benchmark side
    is small by construction (that is the premise of decontamination),
    so collecting its distinct positions is a driver-sized result even
    when the corpus is 100 TB."""
    from vtk_reserves_spark.functions.text import shingles_of_tokens

    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    t = benchmark.select(tokens(normalize_text(F.col(text_col))).alias("_t"))
    g = t.select(F.explode(shingles_of_tokens(F.col("_t"), ngrams)).alias("_g"))
    pos_cols = [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("_g"), F.lit(f"_bf{j}"))), 1, 8),
                16, 10,
            ).cast("long") % m_bits
        ).alias(f"p{j}")
        for j in range(k_hashes)
    ]
    rows = (
        g.distinct()
        .select(*pos_cols)
        .select(F.explode(F.array(*[F.col(f"p{j}") for j in range(k_hashes)])).alias("p"))
        .distinct()
        .collect()
    )
    bits = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        bits[p >> 6] |= 1 << (p & 63)
    # longs with bit 63 set must travel as SIGNED values through lit()
    return [b - (1 << 64) if b >= (1 << 63) else b for b in bits]


def bloom_decontaminate(
    corpus: DataFrame,
    bloom_bits: list[int],
    id_col: str,
    text_col: str,
    ngrams: int = 5,
    k_hashes: int = 2,
) -> DataFrame:
    """Benchmark decontamination against a pre-built Bloom bitset
    (:func:`build_bloom_bits`) — the fixed-memory variant of
    :func:`decontaminate_ngrams` for when even the benchmark gram SET
    is too large to broadcast comfortably: the filter is a constant
    ``m_bits/64``-long array literal (1 KB at the default 8192 bits)
    baked into the plan.

    The corpus-wide stages are NARROW — tokenize, shingle,
    ``explode_outer``, then a scalar bit test (``element_at`` +
    ``bit_get`` against the literal) that no join touches; only the HIT
    grams (rare by construction) reach the one per-document count
    shuffle.  vs :func:`decontaminate_ngrams` this removes the
    broadcast side entirely.  Subject to Bloom false positives
    (deterministic, reproduced bit-for-bit by the SQL oracle); callers
    needing exact hits re-check flagged docs with
    :func:`decontaminate_ngrams`.  Returns contaminated documents only:
    ``(id, n_hits)``.

    Plan-shape note: the gram stream deliberately uses ``explode_outer``
    + a post-explode scalar predicate.  A ``filter``/``exists``
    higher-order function with a ``WHERE`` on its result — or a plain
    ``explode`` — lets Catalyst infer/push a predicate through the
    projection, INLINING the whole tokenize+shingle tree into a
    scan-level Filter that re-evaluates it per reference (measured 14x
    slower); the generator-output predicate cannot be pushed below the
    Generate, so every expensive expression runs exactly once."""
    from vtk_reserves_spark.functions.text import shingles_of_tokens

    m_bits = 64 * len(bloom_bits)
    # one array<long> literal parsed in a single driver call — the bitset
    # is plan metadata and F.lit(list) lowers to 2 py4j round-trips per
    # word, so driver cost would grow with the filter size
    from vtk_reserves_spark.functions.plan_literals import lit_long_array

    bits_lit = lit_long_array(bloom_bits)

    def hit(g: Column) -> Column:
        c = F.lit(True)
        for j in range(k_hashes):
            p = (
                F.conv(
                    F.substring(F.md5(F.concat(g, F.lit(f"_bf{j}"))), 1, 8), 16, 10
                ).cast("long")
                % m_bits
            )
            word = F.element_at(bits_lit, F.shiftright(p, 6).cast("int") + 1)
            c = c & (F.bit_get(word, (p % 64).cast("int")) == 1)
        return c

    t = corpus.select(
        F.col(id_col).alias("_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"),
    )
    g = t.select("_id", shingles_of_tokens(F.col("_t"), ngrams).alias("_g"))
    ex = g.select("_id", F.explode_outer("_g").alias("_gram"))
    return (
        ex.where(hit(F.col("_gram")))  # NULL gram (empty doc) drops here
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"))
        .select(F.col("_id").alias(id_col), F.col("n_hits").cast("int").alias("n_hits"))
    )


def simhash(text: Column, bits: int = 16, seed: str = "sh") -> Column:
    """SimHash of the token multiset: bit b of the result is 1 iff more
    word-hashes have bit b set than unset.

    Single pass over the tokens: one md5 per word (lambda-scoped subtrees
    defeat Catalyst CSE, so per-bit ``filter`` expressions would re-hash
    every word ``bits`` times); per-bit set counts accumulate in an array
    via ``aggregate`` + indexed ``transform``, then fold to the integer.

    Signatures wider than 32 bits switch to a 60-bit word hash — with
    the 32-bit hash every signature bit past 31 would be constant 0,
    silently collapsing the high bands of :func:`simhash_pairs` into a
    single bucket (``bits`` beyond 60 would exceed a signed BIGINT in
    the SQL oracle and raise)."""
    if bits > 60:
        raise ValueError(f"simhash supports at most 60 bits, got {bits}")
    hex_digits = 8 if bits <= 32 else 15
    toks = tokens(normalize_text(text))
    # hash INSIDE the aggregate's input argument (normal expression
    # position — evaluated once); hashing inside the merge lambda would
    # re-run the md5 per accumulator slot (outer-subtree capture)
    hashes = F.transform(toks, lambda w: _word_hash(w, seed, hex_digits))
    # One CONSTANT-SIZE expression regardless of ``bits``: the per-bit
    # majority fold runs inside the aggregate's finish lambda over
    # zip_with(counts, sequence(0, bits-1)), so the Column builds in
    # ~30 py4j round-trips instead of ~90 PER BIT (the unrolled
    # ``out += when(counts[b]...)`` chain measured 0.72 s of driver
    # time at bits=48 and re-referenced the counts subtree 48x in the
    # plan).  The token count rides in the accumulator struct — a
    # lambda-variable reference, never a captured outer subtree, so
    # nothing heavy is re-evaluated per element (the module's CSE
    # rule).  NULL text keeps the original semantics (the old chain's
    # else-branches summed to 0) via the final coalesce.
    zero = F.struct(
        F.array_repeat(F.lit(0).cast("long"), bits).alias("c"),
        F.lit(0).cast("long").alias("n"),
    )
    sig = F.aggregate(
        hashes,
        zero,
        lambda a, h: F.struct(
            _acc_bits(a["c"], h).alias("c"), (a["n"] + 1).alias("n")
        ),
        lambda a: F.aggregate(
            F.zip_with(
                a["c"],
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda c, b: F.when(
                    c * 2 > a["n"],
                    # shift amount is a column: call the SQL function
                    # directly (F.shiftleft only takes a literal shift,
                    # the _acc_bits rule)
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"), b.cast("int")
                    ),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        ),
    )
    return F.coalesce(sig, F.lit(0).cast("long"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int | None = None,
    seed: str = "sh",
) -> DataFrame:
    """Near-duplicate candidate pairs by SimHash band blocking.

    The signature's ``bits`` are split into ``bands`` equal slices; two
    documents whose Hamming distance is < ``bands`` must agree on at
    least one full slice (pigeonhole), so bucketing by (band, slice
    value) finds every such pair without an all-pairs join — the same
    bucket-then-pair shape as :func:`minhash_lsh_pairs`, shuffle
    O(bands·n).  Returns ``(id_a, id_b, hamming)``; ``max_hamming``
    optionally tightens the guarantee-driven default (``bands - 1``)."""
    width = bits // bands
    limit = (bands - 1) if max_hamming is None else max_hamming
    sig = df.select(
        F.col(id_col).alias("doc"), simhash(F.col(text_col), bits, seed).alias("_sh")
    )
    bandarr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("_sh"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    keyed = sig.select("doc", "_sh", F.explode(bandarr).alias("bk")).select(
        "doc", "_sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = (
        keyed.groupBy("band", "key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc"), F.col("_sh")))
            ).alias("ds")
        )
        .where(F.size("ds") > 1)
    )
    ds = F.col("ds")
    pairs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda y: F.struct(
                    x["doc"].alias("id_a"),
                    y["doc"].alias("id_b"),
                    F.bit_count(x["_sh"].bitwiseXOR(y["_sh"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .where(F.col("hamming") <= limit)
        .distinct()
    )


def _acc_bits(acc: Column, h: Column) -> Column:
    """acc[b] += bit b of h, for every b — indexed two-arg transform.
    (F.shiftright only takes a literal shift, so call the SQL function
    with the index column directly.)"""
    return F.transform(
        acc, lambda c, b: c + F.call_function("shiftright", h, b).bitwiseAND(F.lit(1))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    blocking: DataFrame | None = None,
) -> DataFrame:
    """Word n-gram Jaccard similarity over candidate pairs.

    ``blocking`` is a (id_a, id_b) candidate-pair frame (e.g. from
    :func:`minhash_lsh_pairs`); without it every pair is compared —
    acceptable only for small corpora, so pass blocking at scale."""
    from vtk_reserves_spark.functions.text import shingles_of_tokens

    toked = df.select(
        F.col(id_col).alias("_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"),
    ).select("_id", shingles_of_tokens(F.col("_t"), n).alias("_grams"))
    # carry 8-byte xxhash64 values through the candidate join instead
    # of the full shingle strings: intersection/union SIZES (all
    # Jaccard needs) are unchanged short of a 64-bit collision, and
    # the shuffled bytes drop by the average shingle length;
    # array_distinct shrinks them further (dupes don't affect
    # set-semantics intersect/union)
    hashed = toked.select(
        "_id",
        F.array_distinct(
            F.transform("_grams", lambda g: F.xxhash64(g))
        ).alias("_grams"),
    )
    da = hashed.select(F.col("_id").alias("id_a"), F.col("_grams").alias("grams_a"))
    db = hashed.select(F.col("_id").alias("id_b"), F.col("_grams").alias("grams_b"))
    if blocking is None:
        pairs = da.crossJoin(db).where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = blocking.select("id_a", "id_b").join(da, "id_a").join(db, "id_b")
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size(F.array_union(F.col("grams_a"), F.col("grams_b")))
    sim = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return pairs.select("id_a", "id_b", sim.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def remove_duplicate_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate removal at fixed segment granularity:
    drop every text segment that appears (verbatim) in at least
    ``min_docs`` DISTINCT documents, and reassemble each document from
    its surviving segments in original order.

    Segments are non-overlapping ``chunk_tokens``-token windows of the
    whitespace token stream (CCNet dedups paragraphs; this corpus has no
    line structure, so fixed windows are the deterministic analog — a
    caller with real newlines can pre-split and set ``chunk_tokens`` to
    cover a line).  Returns ``(id, text_clean, n_kept, n_dropped)``.

    Scale shape (the reason this is NOT a self-join): segment counts
    reduce with map-side combine (ONE shuffle on the segment string);
    only segments with ``count >= min_docs`` — the boilerplate itself,
    a tiny fraction of all segments — survive into the anti-join side,
    so AQE turns the anti-join into a broadcast at typical
    boilerplate rates.  Reassembly is one groupBy(id) with an
    order-restoring sort over in-group positions, never a global sort."""
    toked = df.select(
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_t"),
    )
    n_seg = F.ceil(F.size("_t") / chunk_tokens).cast("int")
    segs = toked.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_seg, F.lit(1)) - 1),
                lambda i: F.array_join(
                    F.slice(F.col("_t"), i * chunk_tokens + 1, chunk_tokens), " "
                ),
            )
        ).alias("_pos", "_seg"),
    )
    hot = (
        segs.groupBy("_seg")
        .agg(F.count_distinct("_id").alias("_docs"))
        .where(F.col("_docs") >= min_docs)
        .select("_seg")
    )
    kept = segs.join(hot, "_seg", "left_anti")
    out = (
        segs.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_n_total"))
        .join(
            kept.groupBy("_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_pos", "_seg"))),
                        lambda s: s["_seg"],
                    ),
                    " ",
                ).alias("text_clean"),
                F.count(F.lit(1)).alias("n_kept"),
            ),
            "_id",
            "left",
        )
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (F.col("_n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_dropped"),
        )
    )
    return out


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicate-SPAN detection (the span-level refinement of
    :func:`remove_duplicate_segments`, after Lee et al. 2022's
    repeated-substring observation): slide a ``window``-token window at
    stride 1, find windows appearing verbatim in at least ``min_docs``
    distinct docs, and merge each doc's overlapping hits into maximal
    spans ``(doc_id, span_start, span_end, n_windows)`` (token
    offsets, inclusive).

    Callers cut or mask the spans; unlike the fixed-chunk operator this
    finds duplicates at ANY alignment.  Scale shape: the stride-1
    explode is a bounded ``window``-factor expansion of the token
    stream; ONE count shuffle (map-side combine) reduces it; only the
    hot windows — the duplicated material itself — survive into the
    semi-join; span merging is a keyed window (lag + running sum) per
    doc, never global.  At 100 TB swap the joined-string window key for
    a rolling hash (same plan shape, 8x less shuffle width)."""
    toked = df.select(
        F.col(id_col).alias("_id"),
        tokens(F.col(text_col)).alias("_t"),
    ).where(F.size("_t") >= window)
    wins = toked.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - window),
                lambda i: F.array_join(F.slice(F.col("_t"), i + 1, window), " "),
            )
        ).alias("_pos", "_win"),
    )
    hot = (
        wins.groupBy("_win")
        .agg(F.count_distinct("_id").alias("_docs"))
        .where(F.col("_docs") >= min_docs)
        .select("_win")
    )
    hits = wins.join(hot, "_win", "left_semi")
    from pyspark.sql import Window as W

    w_doc = W.partitionBy("_id").orderBy("_pos")
    # merge hits whose coverage [pos, pos+window-1] overlaps or abuts
    new_island = F.when(
        F.col("_pos") > F.lag("_pos").over(w_doc) + window, 1
    ).otherwise(0)
    islands = hits.withColumn("_new", new_island).withColumn(
        "_island",
        F.sum("_new").over(w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        islands.groupBy("_id", "_island")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + window - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            F.col("n_windows").cast("int").alias("n_windows"),
        )
    )


def fuzzy_join_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    ngram: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy self-join: all pairs whose strings are
    within ``max_distance`` Levenshtein edits, WITHOUT the all-pairs
    comparison — candidates come from shared character ``ngram``-grams
    (q-gram blocking), then the exact distance filters them.

    Completeness: by the q-gram lemma, strings x and y with
    ``ed(x, y) <= t`` share at least ``max(|x|,|y|) − q + 1 − t·q``
    q-grams — strictly positive whenever ``max(|x|,|y|) >= q·(t+1)``
    (9 chars for q=3, t=2).  Shorter strings may share no gram and can
    be missed; strings shorter than ``ngram`` produce no grams at all
    and never match.  ``max_bucket`` optionally drops stop-grams whose
    bucket exceeds the cap (the LSH skew device — recall trades for a
    hard bound on pair fan-out; dropped grams only matter if a pair
    shares NOTHING rarer).

    Shape for scale: one gram explode (bounded fan-out: ≤ |s| grams per
    row), ONE equi-join on the gram key, a cheap length pre-filter
    (``|len(a)−len(b)| <= t`` is a Levenshtein lower bound) before the
    per-pair ``distinct``, and the O(|s|²) DP only on surviving
    candidates.  Matching is case-insensitive (lowercased up front).
    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``.
    """
    if max_distance < 0 or ngram < 1:
        raise ValueError("max_distance must be >= 0 and ngram >= 1")
    base = df.select(
        F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_s")
    ).where(F.length("_s") >= ngram)
    grams = base.select(
        "_id",
        "_s",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length("_s") - F.lit(ngram - 1)
                    ),
                    lambda i: F.substring(F.col("_s"), i, F.lit(ngram)),
                )
            )
        ).alias("_g"),
    )
    if max_bucket is not None:
        sizes = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
        grams = (
            grams.join(F.broadcast(sizes.where(F.col("_n") > max_bucket)), "_g", "left_anti")
        )
    b = grams.select(
        F.col("_g"),
        F.col("_id").alias("_id_b"),
        F.col("_s").alias("_s_b"),
    )
    cand = (
        grams.join(b, "_g")
        .where(F.col("_id") < F.col("_id_b"))
        .where(
            F.abs(F.length("_s") - F.length("_s_b")) <= max_distance
        )
        .select("_id", "_id_b", "_s", "_s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_s", "_s_b"))
        .where(F.col("dist") <= max_distance)
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id_b").alias("id_b"),
            "dist",
        )
    )

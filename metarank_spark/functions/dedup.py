"""Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale notes (this is the part that must survive 100 TB):
- exact dedup: one hash-shuffle on the dedup key (window rank) — linear.
- MinHash LSH: signatures are per-row array math (no shuffle); candidate
  generation explodes rows × bands (small constant) and self-joins on the
  band key — pairs are generated only within buckets, never O(n²). The
  verify step computes true shingle Jaccard only for candidates.
- SimHash: per-row bit arithmetic; near-dup buckets = groupBy(signature).
All constants are embedded literals so the DuckDB oracles compute the same
ids bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 1_000_003
SHINGLE_MULT = 8191
# deterministic MinHash parameter table (a odd-ish, b) — LCG-expanded
MINHASH_K = 8
MINHASH_PARAMS = [
    ((1664525 * (i + 1) + 1013904223) % HASH_MOD or 1, (22695477 * (i + 1) + 1) % HASH_MOD)
    for i in range(MINHASH_K)
]
BAND_ROWS = 2  # 8 hashes → 4 bands of 2
SIMHASH_BITS = 20
SIMHASH_MULT = 2654435761
SIMHASH_MOD = 4294967296


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle ids over the token sequence (rolling hash,
    same fold both engines). Empty when len(tokens) < n."""
    assert n == 3, "tuned fold below is for trigrams"
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    sh = F.transform(
        idx,
        lambda i: (
            ((F.get(tokens, i).cast("long") * SHINGLE_MULT + F.get(tokens, i + 1)) % HASH_MOD)
            * SHINGLE_MULT
            + F.get(tokens, i + 2)
        )
        % HASH_MOD,
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<bigint>")
    )


def jaccard_expr(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.nullif(union.cast("double"), F.lit(0.0))


def exact_dedup(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate marking: rows sharing ``key`` form a group; the
    lowest id is the canonical survivor.

    The shuffle/window key is ``xxhash64(key)``, not the raw key: for
    full-document dedup the raw key is the document text, and shipping
    megabyte strings as exchange keys dominates the shuffle at corpus
    scale. Groups are identical up to a 2^-64 xxhash64 collision — the
    same accepted odds as simhash-bucket dedup (and far below the
    parquet/network undetected-corruption floor)."""
    w = Window.partitionBy("__kh").orderBy(id_col)
    cnt = Window.partitionBy("__kh")
    return (
        df.withColumn("__kh", F.xxhash64(key))
        .withColumn("dup_rank", F.row_number().over(w).cast("long"))
        .withColumn("group_size", F.count(F.lit(1)).over(cnt).cast("long"))
        .withColumn("is_dup", (F.col("dup_rank") > 1).cast("boolean"))
        .drop("__kh")
    )


def minhash_signature(tokens: Column) -> list[Column]:
    """k MinHash values over the trigram shingle set:
    h_i(s) = (a_i*s + b_i) mod P, sig_i = min over shingles.

    NOTE: each returned column embeds its own shingle fold — putting all
    k in ONE projection evaluates the trigram fold k(+1) times per row.
    Hot paths should project the shingle array first and derive the
    hashes from the column via minhash_from_shingles (9x fewer HOF
    evaluations, measured 3.3x wall on the signature pass)."""
    sh = shingles_expr(tokens)
    return minhash_from_shingles(sh)


def minhash_from_shingles(sh: Column) -> list[Column]:
    """k MinHash mins derived from an existing shingle-array column.
    Referencing an expensive alias more than once blocks CollapseProject
    from merging the projections, so a two-step
    ``select(sh).select(sh, *mins)`` computes the shingle fold once per
    row instead of once per hash function."""

    def mk(a: int, b: int):
        return lambda s: (F.lit(a) * s + F.lit(b)) % HASH_MOD

    return [F.array_min(F.transform(sh, mk(a, b))) for a, b in MINHASH_PARAMS]


def band_table(df: DataFrame, tokens: str = "tokens",
               id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, band)`` LSH band keys per document — the shareable half
    of minhash_lsh_pairs, for CROSS-corpus candidate joins (a new crawl
    delta probing a stored history band table). Same signature family and
    band layout as the self-join path, so a delta×history join on
    ``band`` surfaces exactly the candidates the batch self-join would.
    Docs with no shingles (<3 tokens) emit no bands."""
    # the no-shingle filter runs on size(tokens) BEFORE the shingle
    # projection (equivalent: trigram shingles are non-empty iff >=3
    # tokens) — filtering on size(__sh) after would be pushed below the
    # Project by the optimizer WITH the fold inlined, evaluating it
    # twice per row (the plan gate in test_text_dedup_sim pins this)
    sh_df = df.filter(F.size(F.col(tokens)) >= 3).select(
        F.col(id_col).alias("doc_id"),
        shingles_expr(F.col(tokens)).alias("__sh"),
    )
    # prefiltered: tokens >= 3 ⇒ shingles non-empty; re-filtering on the
    # computed __sh would push below the Project with the fold inlined
    return bands_from_shingles(sh_df, sh="__sh", prefiltered=True)


def bands_from_shingles(df: DataFrame, sh: str = "sh",
                        id_col: str = "doc_id",
                        prefiltered: bool = False) -> DataFrame:
    """band_table over PRECOMPUTED shingle arrays (r6) — identical
    signature family and band strings, no token fold. This is how the
    delta/streaming state path derives bands from the stored shingle
    state without ever re-shingling history. ``prefiltered`` skips the
    empty-shingle filter when the caller guarantees non-empty arrays
    (a filter on a computed shingle column would inline the fold)."""
    n_bands = MINHASH_K // BAND_ROWS
    base = df if prefiltered else df.filter(F.size(F.col(sh)) > 0)
    sig_df = base.select(
        F.col(id_col).alias("doc_id"), F.col(sh).alias("__sh")
    ).select(
        "doc_id",
        *[s.alias(f"__m{i}")
          for i, s in enumerate(minhash_from_shingles(F.col("__sh")))],
    )
    bands = [
        F.concat_ws(
            "_",
            F.lit(bi),
            *[F.col(f"__m{bi * BAND_ROWS + r}").cast("string")
              for r in range(BAND_ROWS)],
        )
        for bi in range(n_bands)
    ]
    return sig_df.select("doc_id", F.explode(F.array(*bands)).alias("band"))


def minhash_lsh_pairs(
    df: DataFrame,
    tokens: str = "tokens",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 20,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact Jaccard verify.

    Pipeline: signature (per-row) → explode bands → drop non-discriminative
    mega-buckets (> max_bucket members: they carry no near-dup signal and
    would quadratically blow up the candidate join — the standard
    production cap for web-scale LSH) → self-join on band key → dedup
    pairs → verify true Jaccard on trigram shingle sets ≥ threshold.
    """
    n_bands = MINHASH_K // BAND_ROWS
    # materialize (shingles, signatures) ONCE behind an exchange barrier:
    # without it CollapseProject re-inlines the full tokenize→shingle→
    # minhash expression tree into every band reference (~K x recompute),
    # and a single small parquet file would pin everything to one task

    # repartition BEFORE the signature projection: with .select(...).
    # repartition() the exchange sits ABOVE the project, so the expensive
    # shingle+minhash HOFs would run at the scan's parallelism (one task
    # for a fixture-sized single file). Spreading the raw rows first puts
    # the compute on every core.

    # two-step projection: the shingle fold lands in its own Project and
    # the k hash mins read the `sh` COLUMN — one fold per row, not one
    # per hash function (minhash_from_shingles docstring; measured 3.3x
    # on the 2M-doc signature pass, test_text_dedup_sim plan gate).
    sig_df = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("id"),
            shingles_expr(F.col(tokens)).alias("sh"),
        )
        .select(
            "id", "sh",
            *[s.alias(f"__m{i}")
              for i, s in enumerate(minhash_from_shingles(F.col("sh")))],
        )
        # hard materialization barrier: the signature table is referenced
        # by the bucket-cap window and both self-join sides; without it
        # Catalyst re-inlines the expensive expression tree into each
        # reference (measured ~6x wall). localCheckpoint stores the rows
        # MEMORY_AND_DISK like persist would, but the blocks are released
        # by the ContextCleaner when the frame goes out of scope — no
        # cached partitions accumulate across calls. At warehouse scale
        # write the signature table as its own table instead.
        .localCheckpoint(eager=False)
    )
    bands = [
        F.concat_ws(
            "_",
            F.lit(bi),
            *[F.col(f"__m{bi * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)],
        )
        for bi in range(n_bands)
    ]
    # candidate generation on (id, band) ONLY (r6): the band-cap window,
    # the self-join, and the pair dedup previously all shuffled the
    # shingle ARRAYS as payload — three exchanges carrying the heaviest
    # column to move a few bytes of key. Bands are generated from the
    # signature columns alone; the shingle sets re-attach to the ~|near
    # dups| surviving pairs by two id joins against the checkpointed
    # signature table (pair side is small → AQE broadcasts it, so the
    # arrays never cross an exchange at all).
    base = sig_df.filter(F.size("sh") > 0).select(
        "id", F.explode(F.array(*bands)).alias("band")
    )
    bucket_n = Window.partitionBy("band")
    base = base.withColumn("__bn", F.count(F.lit(1)).over(bucket_n)).filter(
        F.col("__bn") <= max_bucket
    ).drop("__bn")
    left = base.select(F.col("id").alias("id_a"), "band")
    right = base.select(F.col("id").alias("id_b"), "band")
    pairs = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        pairs.join(
            sig_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sig_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
    )
    jac = F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Near-duplicate CLUSTER assignment: connected components over a
    pair list (minhash/simhash/embedding candidates), by iterative
    min-label propagation — each node repeatedly takes the minimum label
    among itself and its neighbors until fixpoint.

    Output: one row per id — (id, cluster_id = lexicographic min id of
    its component, cluster_size, is_dup = not the canonical survivor).
    Singletons cluster with themselves.

    Scale notes: label propagation converges in O(component diameter)
    rounds; near-dup components are short chains, so a handful of
    (join + min-aggregate) rounds — each one shuffle on the node key —
    suffices. The driver loop only reads a scalar convergence count per
    round (no row data ever collects). Each round's labels frame is
    local-checkpointed (materialized by the convergence count), which
    both truncates the iterative lineage — the returned frame's plan is
    one window over the final labels, not a deep per-round join tree —
    and leaves no manually-persisted frames behind: checkpoint blocks
    are released by Spark's ContextCleaner once the frame is
    unreferenced, so repeated calls in one session do not accumulate
    cached partitions. At warehouse scale switch to the
    large-star/small-star variant; the per-round plan is identical."""
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).distinct()
    # iterate ONLY over nodes that have an edge: a singleton's label is
    # itself by construction and it contributes nothing to any neighbor,
    # so carrying it through the rounds is pure waste — at corpus scale
    # pair-involved nodes are a small fraction of ids (near-dup rate ×
    # corpus), which shrinks every per-round shuffle from O(|ids|) to
    # O(|pair nodes|). Singletons rejoin after convergence, below.
    labels = (
        edges.select("src").distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("lbl"))
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "lbl")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # eager local checkpoint: materializes this round's labels once,
        # cuts the lineage to the previous rounds (their blocks become
        # unreferenced and are GC-cleaned), and the convergence count
        # below reads the stored blocks instead of recomputing
        new = new.localCheckpoint(eager=True)
        changed = (
            new.withColumnRenamed("lbl", "new_lbl")
            .join(labels, "node")
            .filter(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    # singletons (ids with no candidate pair) cluster with themselves;
    # the leftanti is one shuffle on the id key, paid once — not once per
    # round. Edge-endpoint nodes absent from ids keep the original
    # semantics: they appear in the output with their propagated label.
    labels = labels.unionByName(
        ids.select(F.col(id_col).alias("node"))
        .join(labels.select("node"), "node", "leftanti")
        .withColumn("lbl", F.col("node"))
    )
    size_w = Window.partitionBy("lbl")
    return (
        labels.withColumn("cluster_size", F.count(F.lit(1)).over(size_w).cast("long"))
        .select(
            F.col("node").alias(id_col),
            F.col("lbl").alias("cluster_id"),
            "cluster_size",
            (F.col("node") != F.col("lbl")).alias("is_dup"),
        )
    )


def duplicated_windows(
    seq: DataFrame,
    window: int = 30,
    stride: int = 10,
    min_count: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-window detection — the distributed analog of
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": verbatim ≥50-token substrings repeated
    across a corpus drive memorization; dedup them before training).
    Fixed ``window``-token windows at ``stride`` offsets; a window is
    duplicated when its exact content occurs ≥ ``min_count`` times
    corpus-wide (within- and cross-document alike).

    Scale shape: explode → count by window key → mark join → per-doc
    agg → zero-doc fill. The key is the 96-bit (xxhash64, murmur3) pair
    of the token slice, not the slice itself, so shuffle rows stay ~16
    bytes regardless of window length; two independent hashes keep the
    collision space ~2^96, safe past 10^12 windows where a single 64-bit
    key would birthday-collide. The window-scale shuffles are the
    key-count aggregate (map-side partial, so a degenerate corpus-wide
    hot window — boilerplate, padding runs — costs partial counts, not
    one task) and the mark join (dup-key side is usually small enough
    for AQE to broadcast; a skewed key splits under AQE skew-join); the
    doc-cardinality tail (per-doc agg + the left join that restores
    zero-window docs) is noise next to them.

    Returns (doc_id, n_windows, n_dup_windows, dup_fraction) for every
    doc, zeros/null for docs shorter than one window."""
    starts = F.sequence(
        F.lit(0), F.col("n_tok") - window, F.lit(stride))
    win = F.slice("tokens", F.col("__s") + 1, window)
    # materialization barrier (r6): the hashed-window table is consumed
    # by BOTH the key-count aggregate and the mark-join probe — without
    # it Catalyst re-expands the tokenize + slice + hash chain into two
    # full corpus scans. The stored rows are (doc_id, 16-byte key), the
    # lightweight proxy the shuffle-notes above promise; blocks are
    # GC-released when the frame goes out of scope (same contract as
    # minhash_lsh_pairs). At warehouse scale write it as its own table.
    w = (
        seq.filter(F.col("n_tok") >= window)
        .select(id_col, "tokens", F.explode(starts).alias("__s"))
        .select(
            id_col,
            F.struct(
                F.xxhash64(win).alias("h1"), F.hash(win).alias("h2")
            ).alias("__k"),
        )
        .localCheckpoint(eager=False)
    )
    dup_keys = (
        w.groupBy("__k").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__k", F.lit(1).alias("__dup"))
    )
    per_doc = (
        w.join(dup_keys, "__k", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__w"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("__d"),
        )
    )
    return (
        seq.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__w"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("__d"), F.lit(0)).cast("long")
            .alias("n_dup_windows"),
            F.round(
                F.coalesce(F.col("__d"), F.lit(0)).cast("double")
                / F.when(F.col("__w") > 0, F.col("__w")),
                6,
            ).alias("dup_fraction"),
        )
    )


def simhash_table(
    seq: DataFrame, tokens: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) for every input row — bit-identical to
    ``simhash_expr`` computed with the spread values STAGED: one
    ``transform`` materializes g(t) per token into a column, and the 20
    per-bit majority passes filter that column with a single
    shiftright-and-parity test instead of re-deriving g (multiply + mod
    + double divide + floor) per token per bit. ``floor(g / 2^j) % 2`` ≡
    ``shiftright(g, j) % 2`` exactly (g < 2^32, both operands exact in
    double). The g-array and n columns are referenced by every bit, so
    CollapseProject cannot re-inline the transform — one spread pass per
    row. (Measured on the sf1.0 pass: 7.5 s naive expr, 1.1 s as an
    explode+aggregate, 0.72 s in this staged form — the explode paid
    doc_id duplication per token and a 21-column aggregate.)"""
    g = lambda t: (t.cast("long") * SIMHASH_MULT) % SIMHASH_MOD  # noqa: E731
    staged = seq.select(
        id_col,
        F.transform(tokens, g).alias("__g"),
        F.size(tokens).alias("__n"),
    )
    bits = [
        (
            F.size(F.filter("__g", lambda x: F.shiftright(x, j) % 2 == 1)) * 2
            > F.col("__n")
        ).cast("long")
        * (2**j)
        for j in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return staged.select(id_col, out.alias("simhash"))


def simhash_expr(tokens: Column) -> Column:
    """SimHash over the token multiset: spread each token id with a
    Knuth-style multiplier, majority-vote each of SIMHASH_BITS bits."""
    n = F.size(tokens)
    g = lambda t: (t.cast("long") * SIMHASH_MULT) % SIMHASH_MOD  # noqa: E731

    def bit_pred(j: int):
        # single-arg lambda: F.filter passes (element, index) to 2-arg ones
        return lambda t: F.floor(g(t) / F.lit(float(2**j))).cast("long") % 2 == 1

    bits = [
        (F.size(F.filter(tokens, bit_pred(j))) * 2 > n).cast("long") * (2**j)
        for j in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out

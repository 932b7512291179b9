"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs reproducible splits: the same document
must land in the same split on every run, on any cluster, regardless of
partitioning — so sampling is keyed on a content-derived hash, never on
``rand()`` or row position. The md5-hex-prefix construction used here is
engine-portable (identical in Spark, DuckDB, Postgres, ...), which also
makes these operators exactly oracle-checkable — unusual for "sampling".

The reference has no sampling surface at all (SURVEY.md §2.11); these
are north-star training-pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, chars: int = 2) -> Column:
    """First ``chars`` hex digits of md5(id) read as an INTEGER — a
    uniform bucket in [0, 16^chars) (0..255 for chars=2). Comparing
    integers (not hex strings) keeps frac=1.0 meaningful: a string
    compare against format(256,'02x')=='100' would lexicographically
    keep only buckets '00'..'0f'+'10' (~6.6%), the classic off-by-an-
    encoding bug. The construction is engine-portable: DuckDB spells it
    ('0x'||substr(md5(id),1,2))::INTEGER."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, chars), 16, 10
    ).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.75,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test split by id hash.

    train_frac is quantized to 1/256ths (two hex chars); the split is a
    pure function of the id, so re-runs, retries, and late-arriving
    shards all agree — the property rand()-based splits lack. No
    shuffle: this is a per-row projection that pushes through scans.
    train_frac=1.0 puts every row in 'train' (cutoff 256 > max bucket
    255); 0.0 puts every row in 'test'.
    """
    cutoff = round(train_frac * 256)
    return df.withColumn(
        split_col,
        F.when(
            hash_bucket(F.col(id_col)) < F.lit(cutoff), "train"
        ).otherwise("test"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    shard_col: str = "shard",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle for training-data export.

    Every row gets a shard (16-bit md5 prefix mod n_shards — exactly
    uniform when n_shards divides 65536, else within a relative bias
    of n_shards/65536, negligible for any sane shard count) and a
    within-shard sort key (the full md5 hex). Writing
    ``.repartition(shard_col).sortWithinPartitions(key_col)`` then
    yields globally shuffled shards with NO global sort — one hash
    shuffle, each task sorts only its shard, which is the only layout
    that survives 100 TB (a global orderBy would range-sample and
    funnel through a single skew-prone range exchange). The key is a
    pure function of the id, so re-runs, retries, and incremental
    appends place every row identically — the property rand()-based
    shuffles lack, and what makes shard *membership* oracle-checkable.
    """
    key = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_shards
    )
    return df.withColumn(key_col, key).withColumn(shard_col, shard)


def fixed_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Exactly-k deterministic sample per stratum (reservoir-sampling
    analog without the nondeterminism): rank rows within each stratum
    by md5(id) — a uniform random-but-reproducible order — and keep the
    first k. One shuffle (the window partition-by); with thousands of
    strata the per-stratum state is a single counter, so this scales to
    any corpus. Ties are impossible for DISTINCT ids (md5 injective in
    practice) and id is a secondary sort key, so the plan is total-order
    deterministic — provided ``id_col`` is unique per row. Rows SHARING
    an id share a sort key, and which of them survives a rank-k cut is
    partitioning-dependent; dedup or add a tiebreak column first."""
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep-fractions, each
    quantized to 1/256ths and applied via the same hash-cutoff rule as
    hash_split (frac=1.0 keeps the whole stratum). Equivalent to
    ``df.sampleBy`` but reproducible across engines and immune to
    partitioning/order changes; still a pure filter, so it fuses into
    the scan (no shuffle, no extra pass)."""
    cutoff = F.lit(round(default_frac * 256))
    for k, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == k, F.lit(round(frac * 256))
        ).otherwise(cutoff)
    return df.filter(hash_bucket(F.col(id_col)) < cutoff)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Deterministic budget fill per stratum: order rows by md5(id) (a
    uniform reproducible shuffle), accumulate ``weight_col`` (token
    counts in the corpus-mixing use), and keep every row that STARTS
    within the budget — the first row to overshoot is still kept, so
    each non-empty stratum yields at least one row and the kept total
    is within one document of the budget.

    This is the mixture-building primitive: "take ~N tokens from each
    source" with exact, re-run-stable membership (no rand()), so two
    engines — or two runs months apart — assemble byte-identical
    mixtures. One shuffle (the stratum window); per-stratum state is a
    single running sum, so thousands of strata cost nothing extra.

    Adds ``cum`` = inclusive running weight within the stratum (handy
    for packing downstream); same uniqueness caveat on ``id_col`` as
    fixed_k_per_stratum.
    """
    key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the SAME casted weight in both the running sum and the keep
    # filter: mixing cum(cast) with the raw column would let fractional
    # weights disagree with the accumulated total and bypass the budget
    w_long = F.col(weight_col).cast("long")
    out = df.withColumn("cum", F.sum(w_long).over(w))
    return out.filter(F.col("cum") - w_long < F.lit(budget))


def epoch_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Epoch-weighted dataset mixing (Pile/Dolma-style): each source is
    repeated ``epochs[source]`` times in the training manifest — full
    copies for the integer part, a deterministic md5-selected fraction
    of the docs for the remainder (quantized to 1/256ths, same
    ``hash_bucket`` rule as hash_split, so the fractional epoch is a
    pure function of the id: re-runs and engines agree).

    Plan: a per-row CASE for the rate, one explode of a
    ceil(e)-element sequence (bounded by the largest epoch count —
    row expansion is the SEMANTICS here, not a blowup), and a
    scan-fusable keep filter. No shuffle; the manifest streams out at
    scan speed. At 100 TB the repeated epochs are manifest ROWS (id,
    source, epoch), not copied bytes — the training reader re-reads
    payloads by id."""
    e = F.lit(float(default_epochs))
    for src, rate in sorted(epochs.items()):
        e = F.when(F.col(source_col) == src, F.lit(float(rate))).otherwise(e)
    # guard the zero-epoch source: sequence(0, -1) in Spark is the
    # DESCENDING [0, -1], which would leak a phantom epoch — an empty
    # array makes explode drop the row instead
    n_ep = F.ceil(F.col("_e"))
    out = df.withColumn("_e", e).withColumn(
        epoch_col,
        F.explode(
            F.when(n_ep > 0, F.sequence(F.lit(0), n_ep - 1)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    keep = (F.col(epoch_col) < F.floor(F.col("_e"))) | (
        hash_bucket(F.col(id_col)) < F.round((F.col("_e") - F.floor(F.col("_e"))) * 256)
    )
    return out.filter(keep).drop("_e")


def weighted_sample_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis A-Res scheme): each row draws a reproducible
    uniform u from its id hash and ranks by u^(1/w) — equivalently by
    ln(u)/w descending — so heavier rows win proportionally more often,
    every re-run/retry/shard agrees on the sample, and no rand() state
    exists anywhere. The standard way to draw a size-k corpus sample
    biased toward long/high-quality documents.

    u = (first 6 hex digits of md5(id) + 1) / 16^6 ∈ (0, 1] — the same
    engine-portable md5 rule as hash_split, widened to 24 bits so key
    collisions are rare; +1 keeps ln finite. Requires weight > 0 rows
    (callers filter). Plan: per-row expression fused into the scan,
    TakeOrderedAndProject heap for the cut — no shuffle, no global
    window; the rank is assigned over the k survivors only."""
    from pyspark.sql.window import Window

    b = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10
    ).cast("long")
    key = F.log((b + 1) / F.lit(float(16**6))) / F.col(weight_col).cast("double")
    top = (
        df.select(id_col, weight_col, key.alias("_k"))
        .orderBy(F.col("_k").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("_k").desc(), F.col(id_col))
    return top.select(
        id_col, weight_col, F.row_number().over(w).cast("long").alias("rk")
    )

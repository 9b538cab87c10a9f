"""Deterministic sampling for corpus curation.

``df.sample()`` is seeded per-partition RNG — results change with the
partitioning, can't be reproduced across engines, and can't be re-run
incrementally. The web-scale standard is HASH sampling: keep a row iff
sha256(salt || key) maps below the rate. Properties that matter at
10^12 rows:

- deterministic & partition-invariant: the same row is kept no matter
  how the data is split, shuffled, or re-processed;
- incremental: re-running over a grown corpus keeps the same old rows
  (monotone sample growth — critical for refreshing training sets);
- portable: pure integer arithmetic, reproduced exactly by the DuckDB
  oracle (and any other engine);
- stratified: per-stratum rates via one map lookup, no per-stratum
  passes (contrast sampleBy which builds per-key fractions the same
  way but with RNG).
"""

from __future__ import annotations

from pyspark.sql import functions as F

HASH_SPACE = float(1 << 32)


def _unit_hash(key_col, salt: str):
    """Deterministic U[0,1) from the first 32 sha256 bits of salt||key."""
    return (
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(salt), key_col.cast("string")), 256), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(HASH_SPACE)
    )


def hash_sample(df, rate: float, key_col: str = "doc_id", salt: str = "sample"):
    """Keep ~rate of rows, deterministically by key."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_unit_hash(F.col(key_col), salt) < F.lit(rate))


def stratified_hash_sample(
    df, rates: dict, strat_col: str = "lang", key_col: str = "doc_id",
    default_rate: float = 0.0, salt: str = "sample",
):
    """Per-stratum deterministic rates (e.g. domain-mixing weights):
    {"python": 1.0, "go": 0.5, ...}; strata absent from the dict get
    ``default_rate``. One pass, one map lookup per row."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(rate_map[F.col(strat_col)], F.lit(float(default_rate)))
    return df.filter(_unit_hash(F.col(key_col), salt) < rate)


def mix_corpus(
    df,
    targets: dict,
    budget: float,
    strat_col: str = "lang",
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    salt: str = "mix",
    max_epochs: int = 100,
):
    """Compose a deterministic training MIXTURE: given target weight
    fractions per domain (``targets``, summing to <= 1) and a total
    weight ``budget`` (tokens/chars — whatever ``weight_col`` counts),
    derive each domain's sampling rate needed = target*budget / available
    and materialize it:

    - rate <= 1: deterministic hash DOWN-sample of the domain;
    - rate  > 1: UP-sampling — floor(rate) full epochs of every doc plus
      a hash-sampled fractional epoch (the LLaMA/Pile-style repeat
      factor for small high-value domains).

    Returns the input rows (domains absent from ``targets`` dropped)
    repeated once per epoch with an added ``epoch`` column (0-based) —
    exactly reproducible across runs, partitionings, and engines.

    Scale posture: one tiny aggregate (one row per domain to the
    driver) fixes the rates; the materialization is a map-side
    filter + bounded explode — the corpus itself never shuffles.
    """
    if not targets:
        raise ValueError("targets must name at least one domain")
    for k, v in targets.items():
        if v < 0:
            raise ValueError(f"target for {k!r} must be >= 0, got {v}")
    if sum(targets.values()) > 1.0 + 1e-9:
        raise ValueError(f"targets sum to {sum(targets.values())} > 1")
    avail = {
        r[0]: r[1]
        for r in df.groupBy(strat_col).agg(F.sum(weight_col)).collect()
    }
    missing = [d for d in targets if not avail.get(d)]
    if missing:
        raise ValueError(
            f"domains with no {weight_col} in the corpus: {missing}"
        )
    rates = {d: (targets[d] * budget) / avail[d] for d in targets}
    # an explode of rate copies per row is the materialization cost —
    # a tiny domain asked to fill a huge budget is almost always a
    # mis-specified mixture, not a real 100+-epoch intent; refuse loudly
    # instead of emitting budget/avail copies of every row
    over = {d: r for d, r in rates.items() if r > max_epochs}
    if over:
        raise ValueError(
            f"required repeat rate exceeds max_epochs={max_epochs} for "
            f"{ {d: round(r, 1) for d, r in over.items()} } — shrink the "
            "budget/target or raise max_epochs explicitly"
        )
    full_map = F.create_map(
        *[x for d, r in rates.items() for x in (F.lit(d), F.lit(int(r)))]
    )
    frac_map = F.create_map(
        *[x for d, r in rates.items() for x in (F.lit(d), F.lit(r - int(r)))]
    )
    u = _unit_hash(F.col(key_col), salt)
    n_copies = (
        full_map[F.col(strat_col)]
        + (u < frac_map[F.col(strat_col)]).cast("int")
    )
    out = (
        df.filter(F.col(strat_col).isin(list(targets)))
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
    )
    return out.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
    ).drop("_n")


def cap_per_group(
    df,
    group_col: str,
    n: int,
    order_col: str | None = None,
    ascending: bool = True,
    key_col: str = "doc_id",
    salt: str = "cap",
):
    """Keep at most ``n`` rows per distinct ``group_col`` value — the
    web-pipeline domain-cap rule ("max N pages per host", the
    CommonCrawl/RefinedWeb shape): hot domains are bounded, the long
    tail passes through untouched.

    WHICH rows survive is deterministic: the ``n`` smallest
    ``(order, key)`` per group, where order is ``order_col`` (pass a
    quality score with ``ascending=False`` to keep the BEST n; the
    column must then be numeric — descending order negates it) or, by
    default, the same partition-invariant sha256 unit hash the samplers
    use — a uniform, reproducible, incremental draw within each group.
    ``key_col`` must be unique (it totals the order, so reruns and
    repartitions keep the identical survivor set). NULL group values
    form one group (SQL GROUP BY convention, like the facets).

    Scale posture: NO window over the raw rows (row_number would drag
    every row of a hot domain through one shuffle partition — exactly
    the skewed-host case the cap exists for). A map-side Arrow
    pre-prune keeps at most ``n`` rows per group per batch (the union
    of per-batch top-n is a superset of the global top-n under ANY
    partitioning), then ONE partial-aggregated groupBy carries
    <= n x batches rows per group and a sort_array slice + explode
    emits the survivors — per-group state is O(n), never the group's
    row count.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    for c in [group_col, key_col] + ([order_col] if order_col else []):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame ({df.columns})")
    if order_col is None:
        if not ascending:
            raise ValueError("ascending=False needs an explicit order_col")
        ocol = _unit_hash(F.col(key_col), salt)
    elif ascending:
        ocol = F.col(order_col).cast("double")
    else:
        t = dict(df.dtypes).get(order_col, "")
        if t in ("string", "boolean") or t.startswith(("array", "struct", "map")):
            raise ValueError(
                f"ascending=False needs a numeric order_col, {order_col!r} "
                f"is {t}"
            )
        ocol = -F.col(order_col).cast("double")
    cols = list(df.columns)
    work = df.withColumn("__ord", ocol)

    gcol, kcol, keep = group_col, key_col, n

    def _prune(batches):
        for pdf in batches:
            if len(pdf) <= keep:
                yield pdf
                continue
            pdf = pdf.sort_values(
                ["__ord", kcol], ascending=[True, True], na_position="first"
            )
            yield pdf.groupby(gcol, dropna=False, sort=False).head(keep)

    pruned = work.mapInPandas(_prune, schema=work.schema)
    row = F.struct(
        F.col("__ord").alias("o"),
        F.col(kcol).alias("k"),
        F.struct(*[F.col(c) for c in cols]).alias("p"),
    )
    agg = pruned.groupBy(F.col(gcol).alias("__g")).agg(
        F.slice(F.sort_array(F.collect_list(row)), 1, keep).alias("rows")
    )
    return agg.select(F.explode("rows").alias("r")).select(
        *[F.col(f"r.p.{c}").alias(c) for c in cols]
    )


def weighted_sample(
    df,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
):
    """Weighted sampling WITHOUT replacement — the Efraimidis–Spirakis
    A-Res scheme, the standard distributed weighted sampler (the shape
    importance-based data selection à la DSIR resolves to once
    per-example weights exist): each row draws ``u = unit_hash(key)``
    and keys on ``log(u) / w`` (the log form of u^(1/w) — same
    ordering, no pow underflow, and ``log`` agrees across engines
    better than ``pow``); the ``k`` LARGEST keys are exactly a
    weight-proportional sample without replacement.

    Deterministic end to end: the "randomness" is the curation
    module's portable sha256 unit hash, so the same rows are chosen
    under any partitioning, reruns reproduce bit-identically, a
    different ``salt`` gives an independent draw, and the DuckDB
    oracle recomputes the exact sample. Rows with NULL or
    non-positive weight are EXCLUDED (zero weight means "never
    sample"; negative is an error rule stated here, not silently
    clamped).

    Returns the selected rows (all original columns) plus ``__wkey``
    (the selection key, for auditing; drop it if unwanted), ordered
    key DESC then ``key_col`` ASC — deterministic under ties.

    Scale posture: one JVM-side projection + TakeOrderedAndProject —
    per-partition k-heaps, no shuffle of the corpus, no driver
    involvement beyond the k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c in (weight_col, key_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame ({df.columns})")
    u = _unit_hash(F.col(key_col), salt)
    w = F.col(weight_col).cast("double")
    eligible = df.filter(w.isNotNull() & (w > 0))
    keyed = eligible.withColumn("__wkey", F.log(u) / w)
    return keyed.orderBy(F.desc("__wkey"), F.asc(key_col)).limit(int(k))


def epoch_shuffle(df, epoch: int, key_col: str = "doc_id",
                  salt: str = "epoch"):
    """Deterministic per-epoch global reshuffle — the trainer-feed
    ordering op: every epoch the corpus streams in a fresh, uniform,
    REPRODUCIBLE permutation (same epoch -> bit-identical order on any
    partitioning or rerun; different epoch -> an independent draw), so
    data order is never a hidden source of training nondeterminism and
    any shard range can be re-read exactly for a mid-epoch restart.

    The permutation key is the curation module's portable sha256 unit
    hash of ``salt:epoch`` || key — no RNG state, no seed plumbing,
    recomputable by the SQL oracle. Returns the frame ordered by
    (``__ek`` asc, ``key_col`` asc — total order, deterministic under
    the hash's measure-zero ties) with the key kept as ``__ek`` for
    auditing/sharding (drop it if unwanted).

    Scale posture: one JVM-side projection plus ONE distributed range
    sort (sampled range partitioning, the plan every
    write-sorted-output job uses) — no global window, no dense rank,
    nothing on the driver. A trainer that only needs SHARD-local
    shuffling can sortWithinPartitions on the same key instead and
    skip the exchange entirely."""
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    if key_col not in df.columns:
        raise ValueError(f"column {key_col!r} not in frame ({df.columns})")
    u = _unit_hash(F.col(key_col), f"{salt}:{epoch}")
    return df.withColumn("__ek", u).orderBy(
        F.asc("__ek"), F.asc(key_col)
    )


def take_token_budget(
    df,
    budget: int,
    count_col: str,
    epoch: int = 0,
    key_col: str = "doc_id",
    salt: str = "epoch",
    n_buckets: int = 4096,
):
    """Deterministic token-budget slice — "give me exactly ~N tokens of
    this mix": walk the corpus in :func:`epoch_shuffle` order (the
    uniform per-epoch permutation) and keep every doc whose EXCLUSIVE
    running-total of ``count_col`` is still under ``budget``. The kept
    set's total is >= budget when the corpus has that much (overshoot
    bounded by one doc), the cut point is uniform over the corpus (no
    domain/ingestion-order bias — the permutation is the shuffle), and
    the same (epoch, salt, budget) reproduces the slice bit-identically
    on any partitioning. NULL counts participate as 0 (the doc is kept
    for free), negative counts raise.

    Returns the kept rows plus ``__ek`` (permutation key) and ``__off``
    (the doc's exclusive global token offset — the audit trail: a kept
    doc proves itself with ``__off < budget``).

    Scale posture: the global running total is a TWO-LEVEL prefix sum,
    never one global window (the pack_sequences design): level 1 windows
    WITHIN ``floor(__ek * n_buckets)`` key-range buckets (parallel,
    ~corpus/n_buckets rows each — the permutation key is U[0,1) so
    buckets are balanced by construction, no skew care needed); level 2
    cumulative-sums the n_buckets bucket totals (one small task) and
    broadcasts the bases back. One projection, one bounded window, one
    broadcast join."""
    from pyspark.sql.window import Window

    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    for c in (count_col, key_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame ({df.columns})")
    u = _unit_hash(F.col(key_col), f"{salt}:{epoch}")
    cnt = F.coalesce(F.col(count_col).cast("long"), F.lit(0))
    t = (
        df.withColumn("__ek", u)
        .withColumn("__cnt", cnt)
        .withColumn("_bucket", F.floor(F.col("__ek") * n_buckets).cast("long"))
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(F.asc("__ek"), F.asc(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "_intra", F.coalesce(F.sum("__cnt").over(w_in), F.lit(0))
    )
    totals = t.groupBy("_bucket").agg(F.sum("__cnt").alias("_tot"))
    w_b = Window.orderBy(F.asc("_bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bucket", "_base")
    t = t.join(F.broadcast(offsets), "_bucket").withColumn(
        "__off", F.col("_base") + F.col("_intra")
    )
    neg = t.filter(F.col("__cnt") < 0).limit(1).count()
    if neg:
        raise ValueError(f"negative {count_col!r} values — a token count "
                         "cannot be negative; clean the column first")
    return t.filter(F.col("__off") < budget).drop("_bucket", "_intra",
                                                  "_base", "__cnt")

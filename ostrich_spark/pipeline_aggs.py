"""Pipeline aggregations (EXTENSION — the Elasticsearch parent pipeline
family: ``derivative``, ``cumulative_sum``, ``moving_fn``,
``serial_diff``, ``bucket_selector``, ``bucket_sort``).

In ES these run on the COORDINATOR over a parent multi-bucket
aggregation's returned bucket list — they never touch shards. The
Spark-first translation keeps that contract: each function is a
post-processing step over a bucket DataFrame (the output of
``date_histogram`` / ``facet_counts`` / ``composite_agg`` / any
groupBy), ordered by the bucket key.

Scale posture — deliberately the ES one. A window ordered over ALL
buckets is a single-partition operation; that is correct here because a
pipeline agg's input is an already-reduced bucket list whose cardinality
is bounded by the parent agg (calendar buckets: thousands; terms: the
size cap), not by corpus size. The heavy reduction happened upstream in
the parent agg's partial-aggregated groupBy. For unbounded-cardinality
bucket streams use composite_agg pages and apply these per page — same
as ES, where pipeline aggs simply cannot span composite pages.

Gap semantics: buckets are the OCCUPIED ones the parent produced
(min_doc_count=1). ``derivative``/``serial_diff`` difference against the
previous PRESENT bucket — the ES ``gap_policy: skip`` behavior. The ES
``unit`` option (rate normalization) is ``x_col``/``unit_ms`` on
``derivative``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: ES moving_fn built-ins (the subset with exact SQL equivalents).
_MOVING_FNS = {"avg", "min", "max", "sum", "stddev"}


def _ordered_window(key_cols) -> Window:
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # single ordered frame over the whole (already-reduced, bounded)
    # bucket list — the ES coordinator model; see module docstring
    return Window.orderBy(*[F.col(k).asc() for k in keys])


def derivative(
    df: DataFrame,
    key,
    value: str,
    out: str = "deriv",
    x_col: str | None = None,
    unit_ms: int | None = None,
) -> DataFrame:
    """ES ``derivative``: per-bucket difference of ``value`` vs the
    previous occupied bucket (gap_policy=skip). First bucket gets NULL
    (ES omits the value there). With ``x_col``+``unit_ms`` the
    difference is normalized to a rate per ``unit_ms`` of the bucket
    key (the ES ``unit`` option on date_histogram parents):
    ``(v - lag v) / ((x - lag x) / unit_ms)``."""
    w = _ordered_window(key)
    d = F.col(value) - F.lag(value).over(w)
    if x_col is not None:
        if not unit_ms:
            raise ValueError("x_col needs unit_ms (the rate denominator)")
        dx = (F.col(x_col) - F.lag(x_col).over(w)) / F.lit(float(unit_ms))
        d = d / dx
    return df.withColumn(out, d)


def cumulative_sum(df: DataFrame, key, value: str, out: str = "cumsum") -> DataFrame:
    """ES ``cumulative_sum``: running total of ``value`` in bucket-key
    order (first bucket included — ES semantics)."""
    w = _ordered_window(key).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(value).over(w))


def serial_diff(
    df: DataFrame, key, value: str, lag: int = 1, out: str = "diff"
) -> DataFrame:
    """ES ``serial_diff``: ``value - value[i - lag]`` over occupied
    buckets; the first ``lag`` buckets get NULL."""
    if lag < 1:
        raise ValueError("serial_diff lag must be >= 1")
    w = _ordered_window(key)
    return df.withColumn(out, F.col(value) - F.lag(value, lag).over(w))


def moving_fn(
    df: DataFrame,
    key,
    value: str,
    window: int,
    fn: str = "avg",
    shift: int = 0,
    out: str = "moving",
) -> DataFrame:
    """ES ``moving_fn``: ``fn`` over a sliding window of ``window``
    buckets. ES window placement: with ``shift=0`` the window is the
    ``window`` buckets BEFORE the current one (current excluded);
    ``shift=1`` slides it right to include the current bucket; i.e. the
    frame is rows ``[i - window + shift, i + shift - 1]``. Buckets whose
    frame is entirely before the series start get NULL (empty window —
    ES returns null there too)."""
    if window < 1:
        raise ValueError("moving_fn window must be >= 1")
    if fn not in _MOVING_FNS:
        raise ValueError(f"moving_fn fn must be one of {sorted(_MOVING_FNS)}")
    lo, hi = -window + shift, shift - 1
    if hi < -1_000_000_000 or lo > hi:
        raise ValueError("moving_fn shift places an empty window")
    w = _ordered_window(key).rowsBetween(lo, hi)
    agg = {
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "sum": F.sum,
        "stddev": F.stddev_samp,
    }[fn](value).over(w)
    return df.withColumn(out, agg)


def _percent_label(p: float) -> str:
    """50.0 -> '50', 99.9 -> '99_9' (column-name-safe)."""
    s = f"{p:g}"
    return s.replace(".", "_")


def moving_percentiles(
    df: DataFrame,
    key,
    value: str,
    window: int,
    percents=(50.0,),
    shift: int = 0,
    out: str = "moving_pctl",
) -> DataFrame:
    """ES ``moving_percentiles``: percentiles of the bucket metric over a
    sliding window of ``window`` buckets — EXACT here (the bounded
    window's values sort in a Catalyst expression) where ES merges
    moving t-digest sketches. Window placement follows ``moving_fn``
    exactly: frame = rows ``[i - window + shift, i + shift - 1]``;
    buckets with an empty frame get NULLs (ES returns null there).
    NULL metric values are skipped (collect_list drops them natively —
    gap_policy:skip). The percentile pick is the same nearest-rank rule
    as :func:`percentiles_bucket` (``sorted[round(p/100 · (n−1))]``, the
    documented ES convention). Adds one ``{out}_{p}`` column per
    requested percent. Coordinator model: input is the already-reduced
    bounded bucket list, like every pipeline agg."""
    if window < 1:
        raise ValueError("moving_percentiles window must be >= 1")
    ps = [float(p) for p in percents]
    if not ps:
        raise ValueError("percents must name >= 1 percentile")
    for p in ps:
        if not (0.0 <= p <= 100.0):
            raise ValueError(f"percent {p} outside [0, 100]")
    lo, hi = -window + shift, shift - 1
    if lo > hi:
        raise ValueError("moving_percentiles shift places an empty window")
    w = _ordered_window(key).rowsBetween(lo, hi)
    vals = F.sort_array(F.collect_list(value).over(w))
    df2 = df.withColumn("__mvp", vals)
    n = F.size("__mvp")
    for p in ps:
        pick = F.element_at(
            "__mvp", (F.round(F.lit(p / 100.0) * (n - 1)) + 1).cast("int")
        )
        df2 = df2.withColumn(
            f"{out}_{_percent_label(p)}", F.when(n > 0, pick)
        )
    return df2.drop("__mvp")


# --- sibling pipeline family (ES avg_bucket / sum_bucket / min_bucket /
# max_bucket / stats_bucket / extended_stats_bucket / percentiles_bucket):
# a single-row summary OVER a sibling multi-bucket agg's metric values.
# Same coordinator model as above — the input is the bounded, already-
# reduced bucket list; NULL metric values are skipped (gap_policy=skip,
# which Spark aggregates do natively).


_SIBLING_FNS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}


def bucket_metric(
    df: DataFrame, value: str, fn: str = "avg",
    key=None, out: str | None = None,
) -> DataFrame:
    """ES ``avg_bucket`` / ``sum_bucket`` / ``min_bucket`` /
    ``max_bucket``: one row with ``fn`` over the bucket metric. For
    min/max, passing ``key`` (the bucket-key column) adds a ``keys``
    array column listing EVERY bucket attaining the extreme, sorted —
    the ES min_bucket/max_bucket response shape."""
    if fn not in _SIBLING_FNS:
        raise ValueError(f"bucket_metric fn must be one of {sorted(_SIBLING_FNS)}")
    out = out or f"{fn}_bucket"
    if key is None:
        return df.agg(_SIBLING_FNS[fn](value).alias(out))
    if fn not in ("min", "max"):
        raise ValueError("keys are only defined for min/max (the ES shape)")
    pairs = F.collect_list(
        F.when(
            F.col(value).isNotNull(),
            F.struct(F.col(value).alias("v"), F.col(key).alias("k")),
        )
    )
    row = df.agg(_SIBLING_FNS[fn](value).alias(out), pairs.alias("__pairs"))
    return row.select(
        out,
        F.sort_array(
            F.expr(f"transform(filter(__pairs, s -> s.v = {out}), s -> s.k)")
        ).alias("keys"),
    )


def stats_bucket(df: DataFrame, value: str) -> DataFrame:
    """ES ``stats_bucket``: one row (count, min, max, avg, sum) over the
    bucket metric; count is of non-null values (gap_policy=skip)."""
    return df.agg(
        F.count(value).alias("count"),
        F.min(value).alias("min"),
        F.max(value).alias("max"),
        F.avg(value).alias("avg"),
        F.sum(value).alias("sum"),
    )


def extended_stats_bucket(df: DataFrame, value: str, sigma: float = 2.0) -> DataFrame:
    """ES ``extended_stats_bucket``: stats_bucket plus sum_of_squares,
    POPULATION variance / std_deviation (the ES definition) and the
    ``avg ± sigma * std`` bounds."""
    base = df.agg(
        F.count(value).alias("count"),
        F.min(value).alias("min"),
        F.max(value).alias("max"),
        F.avg(value).alias("avg"),
        F.sum(value).alias("sum"),
        F.sum(F.col(value) * F.col(value)).alias("sum_of_squares"),
        F.var_pop(value).alias("variance"),
        F.stddev_pop(value).alias("std_deviation"),
    )
    s = float(sigma)
    return base.withColumn(
        "std_upper", F.col("avg") + F.lit(s) * F.col("std_deviation")
    ).withColumn("std_lower", F.col("avg") - F.lit(s) * F.col("std_deviation"))


def percentiles_bucket(
    df: DataFrame, value: str, percents=(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)
) -> DataFrame:
    """ES ``percentiles_bucket``: EXACT (non-interpolated) percentiles
    over the bucket metric — the nearest-rank pick ES documents:
    ``sorted[round(p/100 * (n-1))]``. One row per requested percent,
    (percent, value), NULLs skipped; an empty series yields NULL values
    (ES returns null percentiles there)."""
    ps = [float(p) for p in percents]
    if not ps:
        raise ValueError("percents must name >= 1 percentile")
    for p in ps:
        if not (0.0 <= p <= 100.0):
            raise ValueError(f"percent {p} outside [0, 100]")
    arr = df.agg(
        F.sort_array(
            F.expr(f"filter(collect_list({value}), v -> v IS NOT NULL)")
        ).alias("__vals")
    )
    rows = F.array(*[
        F.struct(
            F.lit(p).alias("percent"),
            F.when(
                F.size("__vals") > 0,
                F.element_at(
                    "__vals",
                    (F.round(F.lit(p / 100.0) * (F.size("__vals") - 1)) + 1).cast("int"),
                ),
            ).alias("value"),
        )
        for p in ps
    ])
    return arr.select(F.explode(rows).alias("r")).select("r.percent", "r.value")


def bucket_selector(df: DataFrame, predicate) -> DataFrame:
    """ES ``bucket_selector``: drop buckets failing a predicate over
    their metric columns (SQL HAVING). ``predicate`` is a Column or a
    SQL string (``"n_docs >= 5 AND avg_v < 100"``)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.filter(pred)


def bucket_sort(
    df: DataFrame,
    sort,
    size: int | None = None,
    from_: int = 0,
) -> DataFrame:
    """ES ``bucket_sort``: reorder buckets by metric columns and
    truncate. ``sort`` is a list of (column, "asc"|"desc") pairs (or a
    single pair). ``size``/``from_`` slice the sorted bucket list —
    with a ``size`` this is orderBy+limit (TakeOrderedAndProject);
    ``from_`` pages past the head like the ES parameter."""
    pairs = [sort] if isinstance(sort, tuple) else list(sort)
    cols = [
        F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
        for c, d in pairs
    ]
    out = df.orderBy(*cols)
    if from_ < 0:
        raise ValueError("bucket_sort from_ must be >= 0")
    if size is not None:
        if from_:
            w = Window.orderBy(*cols)
            return (
                out.withColumn("__bs_rn", F.row_number().over(w))
                .filter(
                    (F.col("__bs_rn") > from_) & (F.col("__bs_rn") <= from_ + size)
                )
                .drop("__bs_rn")
            )
        return out.limit(int(size))
    if from_:
        w = Window.orderBy(*cols)
        return (
            out.withColumn("__bs_rn", F.row_number().over(w))
            .filter(F.col("__bs_rn") > from_)
            .drop("__bs_rn")
        )
    return out


def bucket_script(df: DataFrame, out: str, script, inputs=None) -> DataFrame:
    """ES ``bucket_script``: a per-bucket value computed from the
    bucket's OWN metric columns (the parent-pipeline arithmetic shape —
    ratios, differences, weighted mixes of sibling metrics). ``script``
    is a Column or SQL string over the bucket columns (the painless
    ``params.*`` paths map to plain column names here). ES
    ``gap_policy: skip``: list the referenced metric columns in
    ``inputs`` and any NULL input nulls the output (ES skips the
    bucket); without ``inputs`` SQL NULL propagation usually does the
    same for plain arithmetic, but expressions like ``coalesce`` would
    mask a gap. Same coordinator model as the rest of the module: one
    projection over the bounded bucket list, no shuffle at all."""
    expr = F.expr(script) if isinstance(script, str) else script
    if inputs:
        cond = None
        for c in ([inputs] if isinstance(inputs, str) else inputs):
            nn = F.col(c).isNotNull()
            cond = nn if cond is None else (cond & nn)
        expr = F.when(cond, expr)
    return df.withColumn(out, expr)


#: ES normalize pipeline-agg methods (the documented set).
_NORMALIZE_METHODS = (
    "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean", "z-score",
    "softmax",
)


def normalize(
    df: DataFrame, value: str, method: str, out: str = "normalized"
) -> DataFrame:
    """ES ``normalize``: rescale a bucket metric across ALL buckets —

    - ``rescale_0_1``    (v - min) / (max - min)
    - ``rescale_0_100``  100 * (v - min) / (max - min)
    - ``percent_of_sum`` v / sum
    - ``mean``           (v - avg) / (max - min)
    - ``z-score``        (v - avg) / population stddev
    - ``softmax``        e^v / sum(e^v)

    NULL metric values stay NULL and are excluded from the statistics
    (gap_policy=skip — Spark window aggregates ignore NULLs natively).
    Degenerate denominators (all buckets equal -> range/std 0; an
    all-NULL column) yield NULL (try_divide — NULL even under ANSI). One
    unpartitioned window over the already-reduced, bounded bucket list —
    the coordinator model (module docstring), not a data-scale shuffle."""
    if method not in _NORMALIZE_METHODS:
        raise ValueError(
            f"normalize method must be one of {list(_NORMALIZE_METHODS)}, "
            f"got {method!r}"
        )
    w = Window.partitionBy()
    v = F.col(value).cast("double")
    rng = F.max(v).over(w) - F.min(v).over(w)
    # try_divide: a degenerate denominator yields NULL even under ANSI
    if method == "rescale_0_1":
        e = F.try_divide(v - F.min(v).over(w), rng)
    elif method == "rescale_0_100":
        e = F.lit(100.0) * F.try_divide(v - F.min(v).over(w), rng)
    elif method == "percent_of_sum":
        e = F.try_divide(v, F.sum(v).over(w))
    elif method == "mean":
        e = F.try_divide(v - F.avg(v).over(w), rng)
    elif method == "z-score":
        e = F.try_divide(v - F.avg(v).over(w), F.stddev_pop(v).over(w))
    else:  # softmax
        e = F.try_divide(F.exp(v), F.sum(F.exp(v)).over(w))
    return df.withColumn(out, e)


#: rate units: fixed lengths in ms (week = 7 fixed days); the
#: months-family converts via months_between instead.
_RATE_UNIT_MS = {
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}
_RATE_MONTH_UNITS = {"month": 1, "quarter": 3, "year": 12}


def rate(
    df: DataFrame,
    interval: str,
    unit: str,
    value: str = "n_docs",
    out: str = "rate",
    key: str = "bucket_ms",
) -> DataFrame:
    """ES ``rate``: a ``date_histogram`` bucket's metric re-expressed
    per ``unit`` of time — ``value / (actual bucket span in units)``.
    Runs over the histogram's output bucket list (``key`` = the
    ``bucket_ms`` UTC epoch-millis bucket start), CALENDAR-AWARE like
    ES: a month bucket divided by ``day`` uses that month's real day
    count (28/29/30/31), a leap-February differs from March. Fixed
    units (second..week) use their fixed millisecond lengths; the
    months-family units (month/quarter/year) require a months-family
    ``interval`` (whole-month ratio — asking for a per-month rate of an
    hour bucket has no calendar meaning and raises). ``interval`` must
    be the SAME interval the histogram was built with (it determines
    each bucket's end boundary). Pure per-row projection — no window,
    no shuffle."""
    from ostrich_spark.query.exec import _DATE_HIST_FIXED_US, _DATE_HIST_TRUNC

    if interval not in _DATE_HIST_FIXED_US and interval not in _DATE_HIST_TRUNC:
        raise ValueError(
            "rate interval must be a date_histogram interval, got "
            f"{interval!r}"
        )
    if unit not in _RATE_UNIT_MS and unit not in _RATE_MONTH_UNITS:
        raise ValueError(
            f"rate unit must be one of {sorted(_RATE_UNIT_MS) + sorted(_RATE_MONTH_UNITS)}, "
            f"got {unit!r}"
        )
    k = F.col(key).cast("long")
    if interval in _DATE_HIST_FIXED_US:
        if unit in _RATE_MONTH_UNITS:
            raise ValueError(
                f"unit {unit!r} needs a months-family interval "
                "(month/quarter/year buckets), not a fixed-width one"
            )
        span_ms = F.lit(_DATE_HIST_FIXED_US[interval] // 1000)
        denom = span_ms / F.lit(float(_RATE_UNIT_MS[unit]))
    else:
        # calendar bucket: end = start + its calendar step; bucket_ms
        # starts are day-aligned (exec._date_bucket_ms_expr), so the
        # DATE round-trip is exact
        start_d = F.date_from_unix_date((k / F.lit(86_400_000)).cast("int"))
        if interval == "week":
            end_d = F.date_add(start_d, 7)
        else:
            end_d = F.add_months(start_d, _RATE_MONTH_UNITS[interval])
        if unit in _RATE_MONTH_UNITS:
            if interval == "week":
                raise ValueError(
                    f"unit {unit!r} needs a months-family interval "
                    "(month/quarter/year buckets), not week"
                )
            denom = F.months_between(end_d, start_d) / F.lit(
                float(_RATE_MONTH_UNITS[unit])
            )
        else:
            span_ms = (
                F.unix_date(end_d).cast("long") - F.unix_date(start_d).cast("long")
            ) * F.lit(86_400_000)
            denom = span_ms / F.lit(float(_RATE_UNIT_MS[unit]))
    return df.withColumn(out, F.col(value).cast("double") / denom)


def change_point(
    df: DataFrame,
    key,
    value: str,
    min_gain: float = 0.5,
    min_side: int = 2,
) -> DataFrame:
    """Step-change detection over a bucket series — the Elasticsearch
    ``change_point`` aggregation's ``step_change`` case, made
    DETERMINISTIC: where ES runs an ML detector (results unspecified
    beyond "a change point"), this is the classic AMOC (at-most-one-
    change) least-squares split — the split ``s`` minimizing
    SSE_left + SSE_right with at least ``min_side`` buckets per side,
    first-key tie-break. The split qualifies as a step iff
    ``gain = 1 − SSE(s*)/SSE_total ≥ min_gain`` (variance explained by
    the two-level model; SSE_total = 0 → a constant series → no step).

    Returns ONE row: (``type`` step_up/step_down/none, ``change_key``
    = the FIRST key of the after-segment or NULL, ``before_mean``,
    ``after_mean``, ``gain``, ``n``). A series shorter than
    ``2·min_side`` has no candidate split and returns an EMPTY frame.

    Scale posture: runs over an already-reduced bucket frame (the
    pipeline-agg contract — bounded rows); prefix sums via one ordered
    window, every candidate split evaluated as a column, argmin via
    TakeOrdered(1). The raw corpus never participates."""
    if not (0.0 <= min_gain <= 1.0):
        raise ValueError(f"min_gain must be in [0, 1], got {min_gain}")
    if min_side < 1:
        raise ValueError(f"min_side must be >= 1, got {min_side}")
    keys = [key] if isinstance(key, str) else list(key)
    # gap_policy=skip, applied up front: NULL metric buckets are excluded
    # from the series BEFORE any window math, so n / cumulative sums /
    # means / SSE are all computed over the same row set (a windowed
    # count(1) would otherwise count rows the windowed sums skip).
    df = df.filter(F.col(value).isNotNull())
    w = _ordered_window(keys).rowsBetween(Window.unboundedPreceding, 0)
    w_all = _ordered_window(keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    v = F.col(value).cast("double")
    work = df.select(
        *keys,
        v.alias("__v"),
        F.row_number().over(_ordered_window(keys)).alias("__i"),
        # first key of the would-be after-segment: the NEXT bucket in
        # the FULL series (computed before the min_side filter)
        F.lead(keys[0], 1).over(_ordered_window(keys)).alias("__next_key"),
        F.sum(v).over(w).alias("__cs"),
        F.sum(v * v).over(w).alias("__cq"),
        F.sum(v).over(w_all).alias("__ts"),
        F.sum(v * v).over(w_all).alias("__tq"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    n = F.col("__n")
    nl = F.col("__i")
    nr = n - nl
    sse = (
        (F.col("__cq") - F.col("__cs") * F.col("__cs") / nl)
        + (
            (F.col("__tq") - F.col("__cq"))
            - (F.col("__ts") - F.col("__cs"))
            * (F.col("__ts") - F.col("__cs"))
            / nr
        )
    )
    sse_tot = F.col("__tq") - F.col("__ts") * F.col("__ts") / n
    cand = work.filter(
        (nl >= min_side) & (nr >= min_side)
    ).select(
        *keys,
        "__next_key",
        sse.alias("__sse"),
        sse_tot.alias("__stot"),
        (F.col("__cs") / nl).alias("before_mean"),
        ((F.col("__ts") - F.col("__cs")) / nr).alias("after_mean"),
        n.alias("n"),
    )
    best = cand.orderBy(F.asc("__sse"), *[F.asc(k) for k in keys]).limit(1)
    gain = F.when(
        F.col("__stot") > 0, 1.0 - F.col("__sse") / F.col("__stot")
    ).otherwise(F.lit(0.0))
    typ = F.when(gain < F.lit(float(min_gain)), F.lit("none")).otherwise(
        F.when(F.col("after_mean") > F.col("before_mean"), F.lit("step_up"))
        .otherwise(F.lit("step_down"))
    )
    out = best.select(
        typ.alias("type"),
        F.when(typ != "none", F.col("__next_key")).alias("change_key"),
        F.when(typ != "none", F.col("before_mean")).alias("before_mean"),
        F.when(typ != "none", F.col("after_mean")).alias("after_mean"),
        F.round(gain, 6).alias("gain"),
        "n",
    )
    return out

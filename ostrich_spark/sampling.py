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

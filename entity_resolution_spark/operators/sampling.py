"""Deterministic stratified sampling — the training-mix stage.

LLM pretraining corpora are built by *mixing* sources at chosen rates
(e.g. The Pile / LLaMA data recipes: web 67%, code 4.5%, ...).  At 100 TB
the sample must be (a) a pure projection — no shuffle, no global count, no
``sample()`` whose outcome depends on partitioning — and (b) reproducible
run-to-run and engine-to-engine, so reruns and backfills select the same
rows.  Both follow from hashing row *content* (a stable id), never from
``rand()`` or partition-local RNG state.

Mechanism: ``u = int(md5(salt || id)[:15 hex], 16)`` is a uniform 60-bit
integer; a row is kept iff ``u < floor(rate * 2^60)`` for its stratum's
rate.  Thresholds are integers computed driver-side and embedded as
literals, so the keep decision is integer-exact — no float compare to
disagree across engines.  DuckDB mirror of the hash (memory-bank trick):
``('0x' || substr(md5(salt || id), 1, 15))::BIGINT``.

Changing ``salt`` draws an independent sample; holding it fixed while
raising a stratum's rate grows the sample *monotonically* (every
previously-kept row stays kept) — exactly what an incremental top-up of an
under-represented source needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1 << 60  # 15 hex digits of md5


def sample_hash(id_col: Column, salt: str) -> Column:
    """Uniform 60-bit integer from a stable row id (JVM-only expression)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold for a rate in [0, 1] (driver-side, exact)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * _SCALE)


def collect_strata(
    df: DataFrame, strata_col: str, max_strata: int = 10_000
) -> list:
    """Driver-side distinct strata list with an explicit cardinality cap.

    ``hash_stratified_sample`` compiles the rate table into a literal
    CASE expression, so the strata list is a DRIVER-SIDE contract: it is
    safe only for genuinely low-cardinality keys (sources, domains-tiers,
    languages).  Stratifying on a high-cardinality key (url, doc hash)
    would melt the driver and produce a megabyte-scale plan — this helper
    fetches ``max_strata + 1`` distinct values and fails loudly instead.
    """
    vals = [
        r[strata_col]
        for r in df.select(strata_col).distinct().limit(max_strata + 1).collect()
    ]
    if len(vals) > max_strata:
        raise ValueError(
            f"{strata_col} has more than max_strata={max_strata} distinct "
            "values; stratified sampling compiles strata into the plan — "
            "use a lower-cardinality stratum key or raise the cap explicitly"
        )
    return vals


def hash_stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str,
    salt: str = "mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]``,
    deterministically in the row id.  Strata absent from ``rates`` fall back
    to ``default_rate`` (0 = drop, matching a curated-mix allowlist).

    Pure narrow projection + filter: no shuffle, no action, no RNG — the
    same rows survive at any partitioning, parallelism, or engine.
    """
    thresh: Column = F.lit(rate_threshold(default_rate))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(rate_threshold(r))
        ).otherwise(thresh)
    return df.where(sample_hash(F.col(id_col), salt) < thresh)

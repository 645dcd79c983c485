"""Stage 3 — validate_landings (reference R/validation.R:36-106 +
R/validation-functions.R). Alert semantics per SURVEY §2.11; quirk decisions
per SURVEY §8 (Q1 strict_parity flag, Q3 per-call-site back-transforms,
Q4 optional catch validator, Q9 effective masking order).

Spark shape (SURVEY §4.3): the four rule bundles evaluate in ONE pass —
the only extra jobs are the (tiny) bounds aggregations, which broadcast-join
back onto the fact table. No reduce-join recompose: each validated variable
is a single ``when`` expression over its alert column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import expressions as E
from ..operators import joins as join_ops
from ..operators import relational as rel
from ..operators import validation as V

DEFAULT_K = {"k_nboats": 3.0, "k_nfishers": 3.0, "k_catch": 2.5, "k_pricekg": 9.0}
MIN_LANDING_DATE = "2020-12-31"


def validate_dates(df: DataFrame, strict_parity: bool = False) -> DataFrame:
    """Alert 1 — invalid landing_date, mask to NULL (Q1,
    R/validation-functions.R:84-92). The reference assigns alert_date twice
    so only the `< 2020-12-31` rule survives; ``strict_parity=True``
    reproduces that bug, False implements the documented intent (OR of both
    rules: date after submission OR before the floor)."""
    before_floor = F.col("landing_date") < F.lit(MIN_LANDING_DATE).cast("timestamp")
    after_submission = F.col("landing_date") > F.col("submission_date")
    cond = before_floor if strict_parity else (before_floor | after_submission)
    alert = F.when(cond, F.lit(1))
    return (df.withColumn("alert_date", alert)
            .withColumn("landing_date",
                        F.when(F.col("alert_date").isNull(), F.col("landing_date"))
                        .otherwise(F.lit(None).cast("timestamp"))))  # Q10: typed NULL


def validate_nfishers(df: DataFrame, k: float = DEFAULT_K["k_nfishers"]) -> DataFrame:
    """Alert 2 — negative or upper-outlier crew size
    (R/validation-functions.R:112-128): global LocScaleB bounds (expm1
    back-transform per alert_outlier), mask on fire."""
    return _validate_positive_outlier(df, "n_fishers", alert_name="alert_nfishers",
                                      alert_code=2, k=k)


def validate_nboats(df: DataFrame, k: float = DEFAULT_K["k_nboats"]) -> DataFrame:
    """Alert 3 — negative or upper-outlier boat count
    (R/validation-functions.R:147-162)."""
    return _validate_positive_outlier(df, "n_boats", alert_name="alert_nboats",
                                      alert_code=3, k=k)


def _validate_positive_outlier(df: DataFrame, col: str, alert_name: str,
                               alert_code: int, k: float) -> DataFrame:
    bounds = V.loc_scale_bounds(df.filter(F.col(col) >= 0), col, keys=[], k=k,
                                logt=True, back_transform="expm1")
    out = df.crossJoin(F.broadcast(bounds))
    v = F.col(col)
    alert = (F.when(v < 0, F.lit(alert_code))
             .when(F.col("upper_bound").isNotNull() & (v > F.col("upper_bound")),
                   F.lit(alert_code)))
    return (out.withColumn(alert_name, alert)
            .withColumn(col, F.when(F.col(alert_name).isNull(), v))
            .drop("lower_bound", "upper_bound"))


def validate_counts_fused(df: DataFrame,
                          k_nfishers: float = DEFAULT_K["k_nfishers"],
                          k_nboats: float = DEFAULT_K["k_nboats"]) -> DataFrame:
    """Alerts 2+3 in ONE bounds pass (SURVEY §4.3): both global LocScaleB
    fits run inside a single 2-pass aggregate, producing one 1-row bounds
    frame broadcast once — versus one aggregate + one broadcast exchange
    per variable in the sequential formulation. Output is bit-identical to
    ``validate_nboats(validate_nfishers(df))`` (parity-tested): the two
    variables' fits are independent, and masking n_fishers never affects
    the n_boats fit."""
    bounds = V.loc_scale_bounds_multi(
        df, {"n_fishers": (k_nfishers, "expm1"),
             "n_boats": (k_nboats, "expm1")})
    out = df.crossJoin(F.broadcast(bounds))
    for col, alert_name, code in (("n_fishers", "alert_nfishers", 2),
                                  ("n_boats", "alert_nboats", 3)):
        v = F.col(col)
        upper = F.col(f"{col}_upper")
        alert = (F.when(v < 0, F.lit(code))
                 .when(upper.isNotNull() & (v > upper), F.lit(code)))
        out = (out.withColumn(alert_name, alert)
               .withColumn(col, F.when(F.col(alert_name).isNull(), v)))
    return out.drop(*[f"{c}_{b}" for c in ("n_fishers", "n_boats")
                      for b in ("lower", "upper")])


def validate_catch(df: DataFrame, k: float = DEFAULT_K["k_catch"]) -> DataFrame:
    """Alert 4 — catch_kg ≥ per-(gear, catch_taxon, weight_type) upper bound
    (R/validation-functions.R:220-233; exp back-transform per Q3; taxon
    "0"/"no_catch" rows excluded from the bounds fit, P8 at :186).
    NOTE (Q4): defined but not wired into the default stage, as in the
    reference — pass ``include_catch=True`` to validate_landings to wire it.
    """
    keys = ["gear", "catch_taxon", "weight_type"]
    fit = rel.filter_not_in(df, "catch_taxon", ["0", "no_catch"])
    bounds = V.loc_scale_bounds(fit, "catch_kg", keys=keys, k=k,
                                logt=True, back_transform="exp")
    out = join_ops.broadcast_left_join(df, bounds, keys, "left")
    v = F.col("catch_kg")
    alert = F.when(F.col("upper_bound").isNotNull() & (v >= F.col("upper_bound")),
                   F.lit(4))
    return (out.withColumn("alert_catch", alert)
            .withColumn("catch_kg", F.when(F.col("alert_catch").isNull(), v))
            .drop("lower_bound", "upper_bound"))


def validate_pricekg(df: DataFrame, k: float = DEFAULT_K["k_pricekg"]) -> DataFrame:
    """Alert 4 — price_kg outside per-taxon two-sided bounds
    (R/validation-functions.R:293-316): masks price_kg AND catch_kg AND
    catch_price (Q9 interaction preserved)."""
    fit = rel.filter_not_in(df, "catch_taxon", ["0", "no_catch"])
    bounds = V.loc_scale_bounds(fit, "price_kg", keys=["catch_taxon"], k=k,
                                logt=True, back_transform="exp")
    out = join_ops.broadcast_left_join(df, bounds, ["catch_taxon"], "left")
    v = F.col("price_kg")
    alert = F.when(
        F.col("lower_bound").isNotNull()
        & ((v < F.col("lower_bound")) | (v > F.col("upper_bound"))), F.lit(4))
    out = out.withColumn("alert_pricekg", alert)
    for c in ["price_kg", "catch_kg", "catch_price"]:
        out = out.withColumn(c, F.when(F.col("alert_pricekg").isNull(), F.col(c)))
    return out.drop("lower_bound", "upper_bound")


def validate_imeis(df: DataFrame, devices: DataFrame) -> DataFrame:
    """IMEI alerts 1/2/3 — registry suffix match (J9/F1,
    R/validation-functions.R:339-375): too short → 1; ambiguous (>1 match)
    → 2; unknown (0 matches) → 3; unique match → canonical registry value.
    Returns (survey_id, tracker_imei, imei, alert_imei) — one row per
    distinct (survey_id, imei), computed with a broadcast suffix join +
    grouped match count instead of the reference's per-value R loop.
    """
    facts = df.select("survey_id",
                      E.normalize_imei(F.col("tracker_imei").try_cast("double"))
                      .alias("__imei_norm"),
                      F.col("tracker_imei"))
    matched = join_ops.suffix_match_join(
        facts.filter(F.col("__imei_norm").isNotNull() & (F.length("__imei_norm") >= 5)),
        "survey_id", "__imei_norm", devices, "IMEI")
    short_or_null = (facts.filter(F.col("__imei_norm").isNull()
                                  | (F.length("__imei_norm") < 5))
                     .select("survey_id", "__imei_norm",
                             F.lit(None).cast("long").alias("n_matches"),
                             F.lit(None).cast("string").alias("matched_value")))
    unioned = rel.union_by_name([matched, short_or_null])
    alert = (F.when(F.col("n_matches").isNull(), F.lit(1))        # too short / absent
             .when(F.col("n_matches") > 1, F.lit(2))              # ambiguous
             .when(F.col("n_matches") == 0, F.lit(3)))            # unknown
    imei = F.when(F.col("n_matches") == 1, F.col("matched_value"))
    return unioned.select(
        "survey_id",
        F.col("__imei_norm").alias("imei_digits"),
        alert.alias("alert_imei"),
        imei.alias("imei"))


def validate_landings(df: DataFrame, k: dict | None = None,
                      strict_parity: bool = False,
                      include_catch: bool = False) -> DataFrame:
    """The full stage: all rule bundles + fused alert_number.

    The reference computes imei_alerts here but never persists them (Q5 —
    they are consumed in merge_trips instead); we match that: IMEI alerts
    are NOT part of this output. ``alert_number`` fusion (Q6) is included as
    a column since it costs nothing in the fused plan.
    """
    kk = dict(DEFAULT_K, **(k or {}))
    out = validate_dates(df, strict_parity=strict_parity)
    out = validate_counts_fused(out, k_nfishers=kk["k_nfishers"],
                                k_nboats=kk["k_nboats"])
    if include_catch:
        out = validate_catch(out, k=kk["k_catch"])
    out = validate_pricekg(out, k=kk["k_pricekg"])
    alert_cols = ["alert_date", "alert_nfishers", "alert_nboats"] \
        + (["alert_catch"] if include_catch else []) + ["alert_pricekg"]
    out = V.fuse_alerts(out, alert_cols)
    return out.drop(*alert_cols)

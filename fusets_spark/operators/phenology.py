"""Phenometrics — the reference's `calc_phenometrics` (reference
_phenolopy.py:2317-2537) as ONE declarative Spark plan (no UDF).

Per series (one growing season per series, like the reference's per-pixel
cubes): POS/VOS (peak/valley value + day-of-year), AOS (amplitude), BSE
(mean of the two slope minima), MOS (mean of top-80% values on each slope),
SOS/EOS via the `seasonal_amplitude` method (value on the left/right slope
closest to base + factor*amplitude; reference _phenolopy.py:1268-1593), LOS
(season length, wrap-corrected), ROI/ROD (rates), LIOT (trapezoidal integral
of the full series, np.trapz semantics with day spacing;
_phenolopy.py:2217-2314) and LIOS (in-season integral, _phenolopy.py:2081-).

Tie-breaking matches numpy argmax/argmin: FIRST occurrence
(_phenolopy.py:1055) — implemented with lexicographic struct max/min over
(value, -doy) / (value, doy).

Plan shape: window-annotate peak/valley per series (one shuffle on the series
key), aggregate slope-side metrics (reuses the same partitioning), then a
series-key join for in-season integral terms. Catalyst fuses the shared
subexpressions the reference recomputes per metric (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

SERIES_KEYS = ["source", "doc_id"]


def phenometrics(
    df: DataFrame,
    factor: float = 0.5,
    value_col: str = "value",
) -> DataFrame:
    """Per-series phenology metrics. Input: (source, doc_id, ts, value).

    Returns one row per series:
      pos_value pos_doy vos_value vos_doy aos_value bse_value mos_value
      sos_value sos_doy eos_value eos_doy los_value roi_value rod_value
      lios_value liot_value
    """
    v = F.col(value_col)
    doy = F.dayofyear("ts")
    w = Window.partitionBy(*SERIES_KEYS)
    wo = Window.partitionBy(*SERIES_KEYS).orderBy("ts")

    # --- stage 1: per-row annotations (single shuffle on series key)
    pos = F.max(F.struct(v.alias("v"), (-doy).alias("nd"))).over(w)
    vos = F.min(F.struct(v.alias("v"), doy.alias("d"))).over(w)
    ann = (
        df.withColumn("doy", doy)
        .withColumn("pos_value", pos["v"])
        .withColumn("pos_doy", -pos["nd"])
        .withColumn("vos_value", vos["v"])
        .withColumn("vos_doy", vos["d"])
        .withColumn("next_v", F.lead(v).over(wo))
        .withColumn("next_doy", F.lead(doy).over(wo))
    )
    amp = F.col("pos_value") - F.col("vos_value")
    target = F.col("vos_value") + F.lit(factor) * amp
    left = F.col("doy") <= F.col("pos_doy")
    right = F.col("doy") >= F.col("pos_doy")
    trap = (v + F.col("next_v")) / 2 * (F.col("next_doy") - F.col("doy"))
    ann = (
        ann.withColumn("target", target)
        .withColumn("is_left", left)
        .withColumn("is_right", right)
        .withColumn("trap_term", trap)
    )

    # --- stage 2: slope-side aggregation
    vv = F.col(value_col)

    agg = ann.groupBy(*SERIES_KEYS).agg(
        F.first("pos_value").alias("pos_value"),
        F.first("pos_doy").alias("pos_doy"),
        F.first("vos_value").alias("vos_value"),
        F.first("vos_doy").alias("vos_doy"),
        (F.first("pos_value") - F.first("vos_value")).alias("aos_value"),
        (
            (
                F.min(F.when(F.col("is_left"), vv))
                + F.min(F.when(F.col("is_right"), vv))
            )
            / 2
        ).alias("bse_value"),
        (
            (
                F.avg(
                    F.when(
                        F.col("is_left") & (vv >= 0.8 * F.col("pos_value")), vv
                    )
                )
                + F.avg(
                    F.when(
                        F.col("is_right") & (vv >= 0.8 * F.col("pos_value")), vv
                    )
                )
            )
            / 2
        ).alias("mos_value"),
        F.sum("trap_term").alias("liot_value"),
    )
    # SOS/EOS: argmin |v - target| on each slope, first-occurrence tie-break
    # (min_by over a (dist, doy) struct; off-slope rows get dist = inf)
    # tie-break: (dist, doy, ts) — ts is unique per series, so the argmin is
    # fully deterministic even when two same-day values straddle the target
    def _argmin_on(side: str) -> F.Column:
        return F.min_by(
            F.struct(vv.alias("v"), F.col("doy").alias("d")),
            F.struct(
                F.when(F.col(side), F.abs(vv - F.col("target")))
                .otherwise(F.lit(float("inf")))
                .alias("dist"),
                F.col("doy").alias("t"),
                epoch_us("ts").alias("u"),
            ),
        )

    agg2 = ann.groupBy(*SERIES_KEYS).agg(
        _argmin_on("is_left").alias("_sosr"),
        _argmin_on("is_right").alias("_eosr"),
    )
    m = agg.join(agg2, SERIES_KEYS)
    m = (
        m.withColumn("sos_value", F.col("_sosr.v"))
        .withColumn("sos_doy", F.col("_sosr.d"))
        .withColumn("eos_value", F.col("_eosr.v"))
        .withColumn("eos_doy", F.col("_eosr.d"))
        .drop("_sosr", "_eosr")
    )
    los = F.col("eos_doy") - F.col("sos_doy")
    m = m.withColumn(
        "los_value", F.when(los < 0, los + 365).otherwise(los)
    )
    m = m.withColumn(
        "roi_value",
        F.when(
            F.col("pos_doy") != F.col("sos_doy"),
            (F.col("pos_value") - F.col("sos_value"))
            / (F.col("pos_doy") - F.col("sos_doy")),
        ),
    ).withColumn(
        "rod_value",
        F.when(
            F.col("eos_doy") != F.col("pos_doy"),
            (F.col("eos_value") - F.col("pos_value"))
            / (F.col("eos_doy") - F.col("pos_doy")),
        ),
    )

    # --- stage 3: in-season integral (needs sos/eos bounds per row)
    season = ann.join(
        m.select(*SERIES_KEYS, "sos_doy", "eos_doy"), SERIES_KEYS
    ).filter(
        (F.col("doy") >= F.col("sos_doy"))
        & (F.col("next_doy") <= F.col("eos_doy"))
    )
    lios = season.groupBy(*SERIES_KEYS).agg(
        F.sum("trap_term").alias("lios_value")
    )
    return m.join(lios, SERIES_KEYS, "left")

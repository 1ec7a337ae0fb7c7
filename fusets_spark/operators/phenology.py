"""Phenometrics — the reference's `calc_phenometrics` (reference
_phenolopy.py:2317-2537) as ONE declarative Spark plan (no UDF).

Per series (one season per series, like the reference's per-pixel cubes):

  POS/VOS   peak/valley value + day-of-year, numpy-argmax first-occurrence
            ties (_phenolopy.py:1024-1172)
  BSE       mean of the two slope minima (_phenolopy.py:1175-1223)
  MOS       mean of values ≥ 0.8·max on each slope (_phenolopy.py:1072-1124)
  AOS       pos − base (base_metric 'bse' default, as phenology();
            _phenolopy.py:1226-1265)
  SOS/EOS   all 6 of the reference's TIMESAT methods (_phenolopy.py:1268-1593
            and 1596-1921):
            candidates are the POSITIVE-gradient subset of the left slope
            (negative for EOS right slope), where the gradient is the
            central difference over the slope-masked series (xarray
            `differentiate`, NaN-propagating at mask boundaries, one-sided
            at series edges);
              first_of_slope    argmin of signed (v − median) == min v
              median_of_slope   argmin |v − median(candidates)|
              seasonal_amplitude argmin |v − (base + factor·aos)|
                                (one_sided: base = min of the masked slope)
              absolute_value    argmin |v − abs_value|
              relative_value    argmin |v − (q10 + factor·(q90 − q10))|
                                (exact interpolated quantiles of the full
                                series, _phenolopy.py:1482-1485)
              stl_trend         argmin |v − trend(t)| per ROW, trend = STL
                                trend component (smoothing.loess_trend —
                                single-cycle STL degenerates to its trend
                                LOESS, _phenolopy.py:1510-1593)
  LOS       eos_doy − sos_doy, +365 wrap (_phenolopy.py:1924-1978)
  ROI/ROD   rates of increase/decrease (_phenolopy.py:1981-2078)
  LIOS/LIOT trapezoidal integrals, day spacing (_phenolopy.py:2081-2314)
  SIOS/SIOT integral minus the base-rectangle trapezoid: constant bse over
            the same span, so sios = lios − bse·span_season and
            siot = liot − bse·span_total (_phenolopy.py:2136-2214 get_sios,
            2255-2313 get_siot, base_metric 'bse' default)

Plan: window-annotate (one shuffle on the series key) -> scalar aggregate ->
join scalars back for the method target -> argmin aggregate -> in-season
integral. Ties everywhere break (dist, doy, ts) with ts unique per series.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

SERIES_KEYS = ["source", "doc_id"]

METHODS = (
    "first_of_slope",
    "median_of_slope",
    "seasonal_amplitude",
    "absolute_value",
    "relative_value",
    "stl_trend",
)


_INF = float("inf")


def _safe_div(num: Column, den: Column) -> Column:
    """num/den with numpy float semantics for den==0: ±inf, NULL for 0/0
    (ANSI Spark would error; NULL excludes the row like NaN does)."""
    return (
        F.when(den != 0, num / den)
        .when(num > 0, F.lit(_INF))
        .when(num < 0, F.lit(-_INF))
    )


def _gradient(masked: Column, doy: Column, wo: Window) -> Column:
    """Central-difference gradient of the masked series over doy, one-sided
    at series edges, NULL-propagating at mask boundaries (xarray
    differentiate semantics)."""
    mp, mn = F.lag(masked).over(wo), F.lead(masked).over(wo)
    dp, dn = F.lag(doy).over(wo), F.lead(doy).over(wo)
    return (
        F.when(dp.isNull(), _safe_div(mn - masked, dn - doy))
        .when(dn.isNull(), _safe_div(masked - mp, doy - dp))
        .otherwise(_safe_div(mn - mp, dn - dp))
    )


def phenometrics(
    df: DataFrame,
    method: str = "seasonal_amplitude",
    factor: float = 0.5,
    thresh_sides: str = "two_sided",
    abs_value: float = 0.0,
    value_col: str = "value",
) -> DataFrame:
    """One row per series:
    pos_value pos_doy vos_value vos_doy bse_value mos_value aos_value
    sos_value sos_doy eos_value eos_doy los_value roi_value rod_value
    lios_value liot_value
    """
    assert method in METHODS, method
    assert thresh_sides in ("one_sided", "two_sided")
    v = F.col(value_col)
    doy = F.dayofyear("ts")
    w = Window.partitionBy(*SERIES_KEYS)
    wo = Window.partitionBy(*SERIES_KEYS).orderBy("ts")

    # --- stage 1: per-row annotations.
    # Window-op economy (r7): every withColumn that references a window
    # aggregate makes Catalyst emit a SEPARATE Window operator (it does not
    # CSE identical window expressions across projections), and each Window
    # operator is a full buffered pass over every partition. Independent
    # same-spec window expressions are therefore batched into ONE select —
    # the struct aggregates (pos/vos, the sos/eos argmins) are computed
    # once and their fields extracted in a later projection, instead of
    # re-running max/min_by per extracted field. Values are unchanged:
    # this is pure common-subexpression elimination.
    ann = df.withColumn("doy", doy).select(
        "*",
        F.max(F.struct(v.alias("v"), (-F.col("doy")).alias("nd")))
        .over(w)
        .alias("_pos"),
        F.min(F.struct(v.alias("v"), F.col("doy").alias("d")))
        .over(w)
        .alias("_vos"),
        F.lead(v).over(wo).alias("next_v"),
        F.lead(F.dayofyear("ts")).over(wo).alias("next_doy"),
    )
    ann = (
        ann.withColumn("pos_value", F.col("_pos")["v"])
        .withColumn("pos_doy", -F.col("_pos")["nd"])
        .withColumn("vos_value", F.col("_vos")["v"])
        .withColumn("vos_doy", F.col("_vos")["d"])
        .drop("_pos", "_vos")
    )
    ml = F.when(F.col("doy") <= F.col("pos_doy"), v)  # left-slope mask
    mr = F.when(F.col("doy") >= F.col("pos_doy"), v)  # right-slope mask
    dcol = F.col("doy").cast("double")
    ann = ann.withColumn("ml", ml).withColumn("mr", mr)
    # both gradients in one projection: their lag/lead window expressions
    # share spec `wo` and collapse into a single Window operator
    ann = ann.select(
        "*",
        _gradient(F.col("ml"), dcol, wo).alias("grad_l"),
        _gradient(F.col("mr"), dcol, wo).alias("grad_r"),
    )
    ann = (
        ann.withColumn(
            "cand_l", F.col("ml").isNotNull() & (F.col("grad_l") > 0)
        )
        .withColumn(
            "cand_r", F.col("mr").isNotNull() & (F.col("grad_r") < 0)
        )
        .withColumn(
            "trap_term",
            (v + F.col("next_v")) / 2 * (F.col("next_doy") - F.col("doy")),
        )
    )

    # --- stage 2: per-series scalars as WINDOW columns (same partitioning
    # as stage 1 => the whole operator is ONE scan + ONE exchange; the old
    # groupBy + join-back shape re-scanned and re-shuffled the input 7x).
    # All six aggregates share spec `w` and are mutually independent: one
    # select -> one Window operator (was three).
    ann = ann.select(
        "*",
        F.min("ml").over(w).alias("_min_l"),
        F.min("mr").over(w).alias("_min_r"),
        F.avg(F.when(F.col("ml") >= 0.8 * F.col("pos_value"), F.col("ml")))
        .over(w)
        .alias("_mos_l"),
        F.avg(F.when(F.col("mr") >= 0.8 * F.col("pos_value"), F.col("mr")))
        .over(w)
        .alias("_mos_r"),
        F.sum("trap_term").over(w).alias("liot_value"),
        F.sum(F.col("next_doy") - F.col("doy")).over(w).alias("_span_total"),
    )
    ann = (
        ann.withColumn("mos_value", (F.col("_mos_l") + F.col("_mos_r")) / 2)
        .withColumn("bse_value", (F.col("_min_l") + F.col("_min_r")) / 2)
        .withColumn("aos_value", F.col("pos_value") - F.col("bse_value"))
        .withColumn(
            "siot_value",
            F.col("liot_value") - F.col("bse_value") * F.col("_span_total"),
        )
    )

    # --- stage 3: method target + per-row distance
    if method == "stl_trend":
        # per-ROW target: |v − STL trend| at the same time index (reference
        # _phenolopy.py:1510-1593); trend = LOESS kernel (see
        # smoothing.loess_trend for the single-cycle degeneration argument)
        from .smoothing import stl_trend_col

        trend = stl_trend_col(
            df.select(
                "source",
                F.col("doc_id").cast("string").alias("doc_id"),
                "ts",
                v.alias("value"),
            )
        )
        ann = (
            ann.withColumn("_sdoc", F.col("doc_id").cast("string"))
            .join(
                trend.select(
                    "source", F.col("doc_id").alias("_sdoc"), "ts", "trend"
                ),
                ["source", "_sdoc", "ts"],
            )
            .drop("_sdoc")
        )
        dist_l = F.abs(v - F.col("trend"))
        dist_r = F.abs(v - F.col("trend"))
    else:
        if method == "seasonal_amplitude":
            base = (
                F.col("_min_l")
                if thresh_sides == "one_sided"
                else F.col("bse_value")
            )
            base_r = (
                F.col("_min_r")
                if thresh_sides == "one_sided"
                else F.col("bse_value")
            )
            t_l = base + F.lit(factor) * F.col("aos_value")
            t_r = base_r + F.lit(factor) * F.col("aos_value")
        elif method == "relative_value":
            q10 = F.percentile(v, F.lit(0.10)).over(w)
            q90 = F.percentile(v, F.lit(0.90)).over(w)
            t_l = t_r = q10 + F.lit(factor) * (q90 - q10)
        elif method == "absolute_value":
            t_l = t_r = F.lit(float(abs_value))
        else:  # first/median_of_slope: per-side medians (unused for first)
            t_l = F.median(F.when(F.col("cand_l"), v)).over(w)
            t_r = F.median(F.when(F.col("cand_r"), v)).over(w)
        if method == "first_of_slope":
            dist_l, dist_r = v, v  # signed (v - median) argmin == argmin v
        else:
            dist_l = F.abs(v - t_l)
            dist_r = F.abs(v - t_r)

    # --- stage 4: argmin over candidates + derived metrics, still windows
    def _argmin(side: str, dist: Column) -> Column:
        return F.min_by(
            F.struct(v.alias("v"), F.col("doy").alias("d")),
            F.struct(
                F.when(F.col(side), dist)
                .otherwise(F.lit(float("inf")))
                .alias("dist"),
                F.col("doy").alias("t"),
                epoch_us("ts").alias("u"),
            ),
        ).over(w)

    # one Window operator: both argmin structs + both candidate-presence
    # flags share spec `w` (was four operators, each min_by/max running a
    # full pass — and each min_by was computed TWICE, once per extracted
    # field)
    ann = ann.select(
        "*",
        F.max(F.col("cand_l").cast("int")).over(w).alias("_has_l"),
        F.max(F.col("cand_r").cast("int")).over(w).alias("_has_r"),
        _argmin("cand_l", dist_l).alias("_sos"),
        _argmin("cand_r", dist_r).alias("_eos"),
    )
    has_l = F.col("_has_l") == 1
    has_r = F.col("_has_r") == 1
    ann = (
        ann.withColumn("sos_value", F.when(has_l, F.col("_sos")["v"]))
        .withColumn("sos_doy", F.when(has_l, F.col("_sos")["d"]))
        .withColumn("eos_value", F.when(has_r, F.col("_eos")["v"]))
        .withColumn("eos_doy", F.when(has_r, F.col("_eos")["d"]))
        .drop("_has_l", "_has_r", "_sos", "_eos")
    )
    los = F.col("eos_doy") - F.col("sos_doy")
    ann = (
        ann.withColumn("los_value", F.when(los < 0, los + 365).otherwise(los))
        .withColumn(
            "roi_value",
            F.when(
                F.col("pos_doy") != F.col("sos_doy"),
                (F.col("pos_value") - F.col("sos_value"))
                / (F.col("pos_doy") - F.col("sos_doy")),
            ),
        )
        .withColumn(
            "rod_value",
            F.when(
                F.col("eos_doy") != F.col("pos_doy"),
                (F.col("eos_value") - F.col("pos_value"))
                / (F.col("eos_doy") - F.col("pos_doy")),
            ),
        )
    )

    # --- stage 5: in-season integrals (conditions reference the window-
    # attached sos/eos, so this is a second Window pass over the SAME
    # partitioning — no new exchange)
    in_season = (F.col("doy") >= F.col("sos_doy")) & (
        F.col("next_doy") <= F.col("eos_doy")
    )
    ann = ann.select(
        "*",
        F.sum(F.when(in_season, F.col("trap_term"))).over(w).alias("lios_value"),
        F.sum(F.when(in_season, F.col("next_doy") - F.col("doy")))
        .over(w)
        .alias("_span_season"),
    ).withColumn(
        "sios_value",
        F.col("lios_value") - F.col("bse_value") * F.col("_span_season"),
    )

    # --- stage 6: one row per series (all metric columns are per-series
    # constants; the groupBy reuses the window partitioning — no exchange)
    metrics = [
        "pos_value", "pos_doy", "vos_value", "vos_doy", "bse_value",
        "mos_value", "aos_value", "sos_value", "sos_doy", "eos_value",
        "eos_doy", "los_value", "roi_value", "rod_value", "lios_value",
        "liot_value", "sios_value", "siot_value",
    ]
    return ann.groupBy(*SERIES_KEYS).agg(
        *[F.first(c).alias(c) for c in metrics]
    )

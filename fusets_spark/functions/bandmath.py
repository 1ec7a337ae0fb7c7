"""Band math — native column expressions (never UDFs).

Mirrors the reference's vegetation indices: NDVI (_phenolopy.py:158),
EVI (:160), MAVI (:162), RVI (tests/test_mogpr.py:16,
openeo/services/publish_mogpr_s1_s2.py:100-103).
"""

from __future__ import annotations

from pyspark.sql import Column


def ndvi(nir: Column, red: Column) -> Column:
    return ((nir - red) / (nir + red)).alias("ndvi")


def evi(nir: Column, red: Column, blue: Column) -> Column:
    return (2.5 * (nir - red) / (nir + 6 * red - 7.5 * blue + 1)).alias("evi")


def mavi(nir: Column, red: Column, swir1: Column) -> Column:
    return ((nir - red) / (nir + red + swir1)).alias("mavi")


def rvi(vv: Column, vh: Column) -> Column:
    # (VH + VH) / (VV + VH), as written in the reference
    return ((vh + vh) / (vv + vh)).alias("rvi")

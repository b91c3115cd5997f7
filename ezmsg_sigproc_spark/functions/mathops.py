"""Element-wise scalar math — the reference's ``math/`` package as Column ops.

All stateless, all native Catalyst expressions (whole-stage codegen; SURVEY.md
§2.5). Reference locations cited per function.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def abs_(c: Column) -> Column:
    """reference math/abs.py:19-23"""
    return F.abs(c)


def clip(c: Column, lo: float, hi: float) -> Column:
    """reference math/clip.py:24-31"""
    return F.greatest(F.least(c, F.lit(float(hi))), F.lit(float(lo)))


def invert(c: Column) -> Column:
    """reference math/invert.py:14-17 (1/x)"""
    return F.lit(1.0) / c


def log(c: Column, base: float = math.e, clip_zero: bool = False) -> Column:
    """reference math/log.py:24-41; clip_zero maps x<=0 to the smallest
    positive double before the log."""
    x = F.when(c <= 0, F.lit(2.2250738585072014e-308)).otherwise(c) if clip_zero else c
    return F.log(float(base), x)


def pow_(c: Column, exponent: float) -> Column:
    """reference math/pow.py:20-24"""
    return F.pow(c, F.lit(float(exponent)))


def scale(c: Column, k: float) -> Column:
    """reference math/scale.py:20-24"""
    return c * F.lit(float(k))


def const_add(c: Column, k: float) -> Column:
    """reference math/add.py:21-45"""
    return c + F.lit(float(k))


def const_difference(c: Column, k: float, const_first: bool = False) -> Column:
    """reference math/difference.py:22-60 (A−k or k−A)"""
    return F.lit(float(k)) - c if const_first else c - F.lit(float(k))


def sigmoid(c: Column) -> Column:
    """reference activation.py:13-66 ('sigmoid'/'expit')"""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def logit(c: Column) -> Column:
    """reference activation.py ('logit'): log(p/(1-p))"""
    return F.log(c / (F.lit(1.0) - c))


def log_expit(c: Column) -> Column:
    """reference activation.py ('log_expit'): -log(1+exp(-x)), stable form"""
    return -F.log1p(F.exp(-F.abs(c))) + F.least(c, F.lit(0.0))


def linear_transform(c: Column, scale_k: float, offset: float) -> Column:
    """reference linear.py:43-116 (y = scale*x + offset)"""
    return c * F.lit(float(scale_k)) + F.lit(float(offset))


def cart2pol(x: Column, y: Column) -> tuple[Column, Column]:
    """reference coordinatespaces.py:28-46 → (rho, phi)"""
    return F.sqrt(x * x + y * y), F.atan2(y, x)


def pol2cart(rho: Column, phi: Column) -> tuple[Column, Column]:
    return rho * F.cos(phi), rho * F.sin(phi)

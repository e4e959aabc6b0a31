"""Polar coding chain (PDCCH/PBCH/UCI): construction, encode, rate match,
SSC decode."""

from .code import PolarCode, construct  # noqa: F401
from .decoder import decode  # noqa: F401
from .encoder import encode, polar_transform, rate_dematch_llrs  # noqa: F401

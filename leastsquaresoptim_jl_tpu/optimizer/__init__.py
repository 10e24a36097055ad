"""Outer trust-region optimizer loops (Levenberg-Marquardt, Powell dogleg)."""

from .base import Dogleg, LevenbergMarquardt, resolve
from .common import Options

__all__ = ["Dogleg", "LevenbergMarquardt", "resolve", "Options"]

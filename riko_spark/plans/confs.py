"""Conf-vocabulary translation: the reference's config-layer quirks.

riko conf values may be wrapped as ``{"type": "int", "value": "5"}``
and are parsed/cast on access (riko/dotdict.py:43 TV_KEYS, :88-91
``is_type_value``, :147-181 ``parse_sentinel``).  That is a
plan-build-time concern here: ``normalize_conf`` unwraps recursively
before any operator sees the conf.
"""

from __future__ import annotations

from datetime import datetime, timezone
from decimal import Decimal, InvalidOperation
from typing import Any

TV_KEYS = {"type", "value"}


def cast_literal(value: Any, cast_type: str = "text") -> Any:
    """Python-side cast with riko's defaults-on-failure
    (riko/cast.py:280-292,353-422)."""
    try:
        if cast_type == "url":
            return str(value)
        if cast_type == "number":
            f = float(value)
            return int(f) if f.is_integer() else f
        if cast_type == "int":
            return int(float(value))
        if cast_type == "float":
            return float(value)
        if cast_type == "decimal":
            return Decimal(str(value))
        if cast_type == "bool":
            return bool(value) and str(value).lower() not in ("false", "0", "")
        if cast_type in ("date", "datetime"):
            return datetime.fromisoformat(str(value)).replace(tzinfo=timezone.utc)
        return "" if value is None else str(value)
    except (TypeError, ValueError, InvalidOperation):
        defaults = {
            "int": 0,
            "float": float("nan"),
            "decimal": Decimal("NaN"),
            "bool": False,
            "date": datetime(1970, 1, 1, tzinfo=timezone.utc),
            "datetime": datetime(1970, 1, 1, tzinfo=timezone.utc),
        }
        return defaults.get(cast_type, "")


def _is_type_value(v: Any) -> bool:
    return isinstance(v, dict) and set(v) == TV_KEYS


def normalize_conf(conf: Any) -> Any:
    """Recursively unwrap {"type","value"} wrappers and lower-case keys
    (riko lower-cases conf keys at parse time, riko/compile.py:612-644).
    ``{"type": "module", "value": {...}}`` wraps an embedded submodule
    (loop pipes) — unwrapped structurally, not cast."""
    if _is_type_value(conf):
        if conf["type"] == "module":
            return normalize_conf(conf["value"])
        return cast_literal(conf["value"], conf["type"])
    if isinstance(conf, dict):
        return {str(k).lower(): normalize_conf(v) for k, v in conf.items()}
    if isinstance(conf, list):
        return [normalize_conf(v) for v in conf]
    return conf

"""Fluent pipeline API — the ``SyncPipe`` analog.

riko chains stages by attribute access (``SyncPipe('fetch').filter(...)
.sort(...)`` — riko/collections.py:378,498-502 ``__getattr__`` →
``_chain``).  ``Flow`` does the same over DataFrames: any registered
operator name is a chainable method; nothing executes until an action.

The event-order spine (SURVEY.md §7.1.2) rides along: pass
``order_by=[...]`` once and every order-sensitive operator receives it.
"""

from __future__ import annotations

import inspect
from typing import Any

from pyspark.sql import DataFrame

from riko_spark.operators import get_operator, list_operators


def call_operator(name: str, df: DataFrame | None, conf: dict | None, **kwargs) -> Any:
    """Invoke a registered operator, forwarding only the kwargs its
    signature accepts (operators have heterogeneous extras: others,
    other, order_by, spark, field, assign, emit, ...)."""
    fn = get_operator(name)
    sig = inspect.signature(fn)
    accepted = {
        k: v for k, v in kwargs.items()
        if k in sig.parameters and v is not None
    }
    return fn(df, conf, **accepted)


class Flow:
    """Chainable operator pipeline over a DataFrame."""

    def __init__(self, df: DataFrame | None = None, order_by: list[str] | None = None):
        self._df = df
        self.order_by = order_by

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            raise ValueError("flow has no DataFrame yet — start with a source")
        return self._df

    def __getattr__(self, name: str):
        if name.startswith("_") or name not in list_operators():
            raise AttributeError(name)

        def stage(conf: dict | None = None, **kwargs) -> "Flow":
            others = kwargs.pop("others", None)
            if others:
                others = [o.df if isinstance(o, Flow) else o for o in others]
            other = kwargs.pop("other", None)
            if isinstance(other, Flow):
                other = other.df
            out = call_operator(
                name, self._df, conf,
                order_by=kwargs.pop("order_by", self.order_by),
                others=others, other=other, **kwargs,
            )
            if isinstance(out, list):  # split
                return [Flow(o, self.order_by) for o in out]
            order = self.order_by
            if name == "sort" and conf:
                rules = conf.get("rule") or []
                rules = [rules] if isinstance(rules, dict) else rules
                order = [
                    f"{r['field']} desc"
                    if str(r.get("dir", "asc")).lower() == "desc" else str(r["field"])
                    for r in rules
                ] + (self.order_by or [])
            return Flow(out, order)

        return stage

    # convenience actions
    def collect(self):
        return self.df.collect()

    def to_list(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.df.collect()]

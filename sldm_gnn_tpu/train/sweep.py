"""Grid parameter-sweep engine.

Parity target: /root/reference/src/utils.py:65-119 ``ParamSweepContext`` —
grid = cartesian product of list-valued params; tuple-valued params
``(callable, dep_name)`` are derived from another param per combination
(e.g. ``gs_gru_hidden_size = gs_hidden_size``, main.py:43).
"""

from __future__ import annotations

from itertools import product
from typing import Any, Callable, Iterable


class ParamSweepContext:
    def __init__(self, params_dict: dict[str, list | tuple[Callable, str]]):
        for name, val in params_dict.items():
            if not isinstance(name, str):
                raise TypeError(f"param name must be str, got {type(name)}")
            if isinstance(val, tuple):
                if len(val) != 2 or not callable(val[0]) or not isinstance(val[1], str):
                    raise TypeError(
                        f"derived param '{name}' must be (callable, dep_name) tuple"
                    )
            elif not isinstance(val, list):
                raise TypeError(
                    f"param '{name}' must be a list of values or a (callable, dep) tuple"
                )

        self._lambdas = {n: v for n, v in params_dict.items() if isinstance(v, tuple)}
        grid = {n: v for n, v in params_dict.items() if not isinstance(v, tuple)}
        self._names = list(grid.keys())
        self._values = [grid[n] for n in self._names]

    def combinations(self) -> Iterable[dict[str, Any]]:
        for combo in product(*self._values):
            d = dict(zip(self._names, combo))
            for name, (fn, dep) in self._lambdas.items():
                if dep not in d:
                    raise ValueError(
                        f"dependency '{dep}' of derived param '{name}' not in grid"
                    )
                d[name] = fn(d[dep])
            yield d

    def __len__(self) -> int:
        n = 1
        for v in self._values:
            n *= len(v)
        return n

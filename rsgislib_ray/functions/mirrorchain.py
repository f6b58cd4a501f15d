"""Dual-target float expression chains (engine <-> DuckDB oracle).

The repo's exactness convention is "fixed float chains over exact
integer moments": every float expression must be written with the
IDENTICAL operation order in the engine (Python/numpy IEEE doubles)
and in the SQL oracle (DuckDB DOUBLE).  Previous operators mirrored
the two sides by hand; the iteratively-reweighted eigen loops
(MAD/ISFA, changedetect/imgchngmthds.py:521,820) need 100+ chained
expressions per iteration, so this module writes each chain ONCE as
``(name, expr)`` string pairs in a restricted dialect that is
simultaneously a valid Python expression and a valid DuckDB scalar
expression:

- operators: ``+ - * /`` and parentheses (both IEEE-754 double ops),
- functions: SQRT EXP LN ABS ACOS COS SIN CBRT LEAST GREATEST
  (mapped to math.*/min/max in Python, builtins in DuckDB 1.0 —
  both resolve to the platform libm, bit-identical here),
- literals: ``1.5e0`` style floats and plain ints (int/int division
  yields DOUBLE in DuckDB and float in Python — same value).

``eval_chain`` evaluates the chain over a dict env (scalars -> plain
Python floats/ints, exactly DuckDB's scalar semantics; pass numpy
arrays + ``vector=True`` for per-row chains — numpy elementwise f64
ops are the same IEEE ops DuckDB applies per row).  ``chain_ctes``
emits the chain as a cascade of one-column-at-a-time CTEs, so the SQL
engine is forced through the same evaluation ORDER.
"""

from __future__ import annotations

import math

import numpy as np

Chain = list[tuple[str, str]]

_SCALAR_FNS = {
    "SQRT": math.sqrt,
    "EXP": math.exp,
    "LN": math.log,
    "ABS": abs,
    "ACOS": math.acos,
    "COS": math.cos,
    "SIN": math.sin,
    "TAN": math.tan,
    "ATAN": math.atan,
    "CEIL": math.ceil,
    "FLOOR": math.floor,
    "CBRT": math.cbrt,
    "LEAST": min,
    "GREATEST": max,
    "PI": lambda: math.pi,
}

# numpy's SIMD exp/log/arccos/cbrt kernels differ from libm by 1 ulp
# on ~25% of inputs (measured); DuckDB calls libm, so the vector side
# routes those through per-element libm via np.vectorize — slower,
# but mirror chains run on test-scale fixtures and the hot general
# paths don't go through this module.  sqrt/cos/sin/abs/min/max are
# correctly-rounded (or bit-identical) in numpy and stay vectorized.
_VECTOR_FNS = {
    "SQRT": np.sqrt,
    "EXP": np.vectorize(math.exp, otypes=[np.float64]),
    "LN": np.vectorize(math.log, otypes=[np.float64]),
    "ABS": np.abs,
    "ACOS": np.vectorize(math.acos, otypes=[np.float64]),
    "COS": np.cos,
    "SIN": np.sin,
    "TAN": np.vectorize(math.tan, otypes=[np.float64]),
    "ATAN": np.vectorize(math.atan, otypes=[np.float64]),
    "CEIL": np.ceil,
    "FLOOR": np.floor,
    "CBRT": np.vectorize(math.cbrt, otypes=[np.float64]),
    "LEAST": np.minimum,
    "GREATEST": np.maximum,
    "PI": lambda: math.pi,
}


def eval_chain(chain: Chain, env: dict, vector: bool = False) -> dict:
    """Evaluate the chain over ``env`` (copied, then extended with one
    entry per chain step).  Scalar mode uses math.* on Python floats;
    vector mode uses the numpy elementwise equivalents."""
    out = dict(env)
    fns = dict(_VECTOR_FNS if vector else _SCALAR_FNS)
    fns["__builtins__"] = {}
    for name, expr in chain:
        out[name] = eval(expr, fns, out)  # noqa: S307 - literal DSL
    return out


def chain_ctes(chain: Chain, base: str, prefix: str) -> tuple[str, str]:
    """Emit ``chain`` as chained CTE text ``p0 AS (SELECT *, e AS n
    FROM base), p1 AS (...) ...``; returns (cte_sql, last_cte_name).
    One new column per CTE pins DuckDB to the chain's exact order."""
    parts = []
    prev = base
    for k, (name, expr) in enumerate(chain):
        cte = f"{prefix}{k}"
        parts.append(f"{cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return ",\n    ".join(parts), prev

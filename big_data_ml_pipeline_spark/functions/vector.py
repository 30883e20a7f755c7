"""Vector math over ``array<float|double>`` columns — pure Catalyst.

Higher-order functions (`zip_with`, `aggregate`, `transform`) keep the
dot product / norms JVM-side and deterministic (sequential fold over the
array), so no Pandas UDF is needed for the dense-vector hot path.

Two construction paths produce the SAME expression trees:

- Column-argument wrappers (``dot(colA, colB)``) — the original pyspark
  HOF builders. Each higher-order function costs ~15-30 py4j round
  trips (lambda creation, seq conversion), which r17 profiling showed
  DOMINATES the wall clock of the PQ/IVF query family at bench scale
  (~5 s of pure driver time per probe query, vs <1 s of execution).
- ``*_sql(name, ...) -> str`` builders — render the identical
  expression as ONE SQL string over *column names* and parse it
  server-side with a single ``F.expr`` call. The parsed tree is the
  same functions in the same order with the same literal values
  (doubles via ``repr + D``, the exact-round-trip rendering pinned in
  tests), so results are bit-identical; only the number of py4j calls
  changes. Use the ``_sql`` path whenever the operands are plain
  column names (every internal ``__pq*``/``__adc*`` kit column);
  keep the Column path for arbitrary caller expressions.

Lambda-variable hygiene for the ``_sql`` builders: SQL lambda
parameters shadow outer columns inside the lambda BODY, so every body
here references only its own parameters (x, y, acc, v) and literals —
never an outer column — making shadowing irrelevant. Operand strings
are substituted as function ARGUMENTS (outside the lambda body), where
outer-scope resolution applies unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _double_sql_array(values) -> str:
    """The ``array(array(1.5D, ...), ...)`` rendering (validates)."""
    if isinstance(values, (list, tuple)):
        if not values:
            raise ValueError("empty list in double_sql")
        return "array(" + ",".join(_double_sql_array(x) for x in values) + ")"
    fv = float(values)
    if fv != fv or fv in (float("inf"), float("-inf")):
        raise ValueError("non-finite value in double_sql")
    return repr(fv) + "D"


def _shape(values) -> tuple[int, int]:
    """(nesting depth, flat element count) of a nested list."""
    if not isinstance(values, (list, tuple)):
        return 0, 1
    d, n = 0, 0
    for v in values:
        dv, nv = _shape(v)
        d, n = max(d, dv), n + nv
    return d + 1, n


def double_sql(values) -> str:
    """Render a (nested) list of doubles as a SQL literal string with
    bit-exact round-trip (including subnormals, ±0.0 and ±1.79e308;
    pinned in tests). Non-finite values and empty lists are rejected
    (``array()`` parses as an empty UNTYPED array, silently
    mismatching array<double> consumers downstream).

    Small tables render as ``array(array(1.5D, ...), ...)``. Large
    ones render as ``from_json('<json>', 'array<...double>')`` — the
    analyzer then carries ONE expression node instead of an N-node
    CreateArray tree (r17: analysis re-walking multi-thousand-entry
    codebook/cross-term trees on every DataFrame op dominated the
    PQ query family's build time), and ConstantFolding evaluates the
    parse exactly once per query into the SAME Literal the array()
    form folds to. Both decimal→double conversions are correctly
    rounded, so the values are bit-identical (pinned in tests); the
    optimized plan is byte-identical either way."""
    depth, count = _shape(values)
    if depth == 0 or count < 64:
        return _double_sql_array(values)
    import json

    # Validate exactly like the array() form (finite, no empty lists).
    _double_sql_array(values)
    schema = "array<" * depth + "double" + ">" * depth
    return "from_json('" + json.dumps(values) + "', '" + schema + "')"


def dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot` over two array-expression strings."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """SQL text of :func:`l2_norm` over an array-expression string."""
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def to_double_array_sql(a: str) -> str:
    """SQL text of :func:`to_double_array` over an array-expression
    string."""
    return f"transform({a}, x -> CAST(x AS DOUBLE))"


def cosine_similarity_sql(a: str, b: str) -> str:
    """SQL text of :func:`cosine_similarity` over two array-expression
    strings. The denominator product appears twice (condition + value),
    exactly like the Column form's ``when(denom != 0, dot/denom)``."""
    denom = f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return (
        f"CASE WHEN ({denom} != 0) THEN ({dot_sql(a, b)} / {denom}) "
        "ELSE 0.0D END"
    )


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")

#: Parse cache for the one-parse string fast paths. The expression kits
#: (IVF/PQ/ADC) render large literal tables (from_json codebooks) into
#: their SQL strings; every kit invocation re-parsed the identical
#: string server-side — once per bench query is fine, but the
#: streaming ingests invoke the kits PER MICRO-BATCH, and r18 driver
#: thread dumps showed the stream-execution thread inside
#: AstBuilder.visitFunctionCall re-parsing them. A Column wraps an
#: immutable UNRESOLVED tree: reusing it across DataFrames/batches/
#: sessions in one JVM is exactly as safe as the kit closures already
#: reusing their `cent_lit = F.expr(...)` captures — analysis
#: re-resolves per plan under the active session's conf.
_EXPR_CACHE: dict[str, Column] = {}


def cached_expr(sql: str) -> Column:
    """``F.expr(sql)`` memoized on the SQL text (bounded; cleared on
    overflow — kit strings are few and hot, one-off strings cycle)."""
    col = _EXPR_CACHE.get(sql)
    if col is None:
        if len(_EXPR_CACHE) >= 512:
            _EXPR_CACHE.clear()
        col = F.expr(sql)
        _EXPR_CACHE[sql] = col
    return col


def safe_ident(col, reserved: tuple = ()) -> str | None:
    """``col`` when it is a plain SQL identifier not in ``reserved``,
    else None. Guards every *_sql string fast path: a non-identifier
    name (``a-b``) would parse as arithmetic instead of a column
    reference, and a name equal to a generated lambda's parameter
    would be captured inside that lambda body and silently compute
    the wrong thing. Unsafe names fall back to the Column builder
    path — identical expression tree, just more py4j calls."""
    if (
        isinstance(col, str)
        and _IDENT_RE.match(col)
        and col not in reserved
    ):
        return col
    return None


def _as_name(col) -> str | None:
    """The operand's SQL text when it is a plain identifier, else
    None. vector.py's builders substitute operands only as function
    ARGUMENTS (outside every generated lambda body — see module
    docstring), so no reserved-parameter set is needed here."""
    return safe_ident(col)


def to_double_array(col) -> Column:
    """Cast array<float> → array<double> (exact widening) so downstream
    arithmetic is double-precision on every engine. Accepts a column
    NAME (one server-side parse) or a Column (HOF build)."""
    if _as_name(col) is not None:
        return cached_expr(to_double_array_sql(col))
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product via zip_with + aggregate (sequential, deterministic).
    Accepts column NAMES (one server-side parse) or Columns.

    Oracle SQL (DuckDB): ``list_dot_product(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``.
    """
    if _as_name(a) is not None and _as_name(b) is not None:
        return cached_expr(dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    if _as_name(a) is not None:
        return cached_expr(l2_norm_sql(a))
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two double arrays; 0.0 when either norm is 0."""
    if _as_name(a) is not None and _as_name(b) is not None:
        return cached_expr(cosine_similarity_sql(a, b))
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def nested_double_lit(values) -> Column:
    """Literal (arbitrarily nested) array of doubles as ONE parsed
    expression.

    ``F.lit`` / ``F.array`` over Python lists issue one py4j call PER
    SCALAR — a 2048-entry PQ cross-term table costs ~4 s of pure
    driver time, and the IVF/PQ expression kits embed several such
    tables per query. Rendering the same doubles as a single SQL
    string (:func:`double_sql`) and parsing it once is ~10× faster
    with bit-identical Literal values. Plan shape is unchanged (same
    nested-array Literal node), so exchange reuse and the SQL twins
    are unaffected."""
    return cached_expr(double_sql(values))

"""Codegen-friendly vector math over array<float> columns.

Spark's higher-order functions (zip_with / aggregate / transform) are
evaluated by the interpreted expression path — they sit OUTSIDE
whole-stage codegen, and a lambda-per-element dot product measured ~30x
slower than the equivalent unrolled expression on the sf0.1 embeddings
fixture (4.7s -> 0.15s for brute-force top-k). These helpers unroll the
loop over a statically-known dimension into a flat sum of GetArrayItem
products, which Tungsten compiles into one tight codegen span.

The unroll is bounded (dim=64 in the fixtures; codegen splits oversized
methods automatically), and every helper takes the dimension explicitly
so the expression is fixed at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _balanced_sum(terms: list[Column]) -> Column:
    """Pairwise-balanced addition tree (depth log2 n instead of n).

    Float addition isn't associative, so the tree SHAPE is part of each
    kernel's deterministic contract — both shapes are deterministic, but
    the balanced one plans measurably faster on the driver (Catalyst
    walks a depth-6 tree instead of depth-64 per rule pass: 0.65s ->
    0.54s for a 64-term norm scan) and its partial sums stay
    closer in magnitude (mildly better numerics than left-to-right)."""
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                 for i in range(0, len(terms), 2)]
    return terms[0]


def dot(a, b, dim: int) -> Column:
    """sum_i a[i]*b[i] as a flat codegen'd expression."""
    a, b = _col(a), _col(b)
    return _balanced_sum([a[i].cast("double") * b[i].cast("double")
                          for i in range(dim)])


def dot_lit(col, coeffs: list[float]) -> Column:
    """Dot product against a driver-side constant vector (hyperplane,
    centroid): constants fold into the codegen'd expression — no array
    literal, no per-element lambda."""
    col = _col(col)
    return _balanced_sum([col[i].cast("double") * F.lit(float(v))
                          for i, v in enumerate(coeffs)])


def norm_sq(col, dim: int) -> Column:
    col = _col(col)
    return _balanced_sum([col[i].cast("double") * col[i].cast("double")
                          for i in range(dim)])


def norm(col, dim: int) -> Column:
    return F.sqrt(norm_sq(col, dim))

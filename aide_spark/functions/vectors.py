"""Vector math over array<float> embedding columns — sequential left-fold
accumulation (``F.aggregate``) so results are bit-identical to a DuckDB
``list_reduce`` oracle, independent of partitioning.

All elements are cast to double BEFORE multiplication in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to ``decimals`` (absorbs nothing — the fold
    is already deterministic — but keeps the surface stable)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)


# DuckDB oracle fragments (dialect twins of the above)
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)), (x,y) -> x+y)"
    )


def duck_cosine(a: str, b: str, decimals: int = 6) -> str:
    return (
        f"round({duck_dot(a, b)} / "
        f"(sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)})), {decimals})"
    )

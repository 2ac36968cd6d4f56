"""Physical-plan invariants over the ENTIRE driver query surface: no
cartesian product, no row-at-a-time Python UDF (`BatchEvalPython`) in any
``queries()`` plan. Arrow-batched pandas UDFs (`ArrowEvalPython`,
`FlatMapGroupsInPandas`, `MapInPandas`) are the sanctioned Python path.

This pins the VERDICT r1 anti-pattern scan ("no per-row Python UDFs, no
crossJoin") as a regression guard instead of a one-off audit.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_cartesian_or_row_python(spark, name):
    df = entrymod.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for marker in FORBIDDEN:
        assert marker not in plan, f"{name}: {marker} in physical plan"

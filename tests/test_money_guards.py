"""Loud guard for the _cents non-negativity assumption (ADVICE r7).

``queries.tpch._cents`` / ``_sql_cents`` use floor(x*100 + 0.5), which
rounds half-UP for positive x but half-DOWN for negative x. Cross-engine
parity holds for any sign (both engines share the op sequence), but the
ROUNDING CONVENTION is only the conventional half-away-from-zero for
non-negative inputs. This test pins that every expression a _cents call
site actually consumes is non-negative on the fixtures, so a future
fixture with refunds/adjustments fails HERE with a clear message
instead of silently shipping unconventional rounding.

Call-site inventory (grep '_cents(' over queries/):
- lineitem: l_extendedprice, l_extendedprice*(1-l_discount),
  l_extendedprice*(1-l_discount)*(1+l_tax), l_extendedprice*l_discount,
  l_extendedprice/l_quantity  → safe iff price ≥ 0, 0 ≤ discount ≤ 1,
  tax ≥ 0, quantity > 0
- part×lineitem: p_retailprice*l_quantity*0.1 → safe iff retail ≥ 0
- Q22: c_acctbal AFTER filtering to balances above the positive-only
  average → structurally > 0, but raw c_acctbal IS negative; assert
  the filter precondition (a positive average exists).
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    yield c
    c.close()


def test_cents_inputs_nonnegative(con, sf_dir):
    lo = con.execute(
        f"""
        SELECT min(l_extendedprice), min(l_discount), max(l_discount),
               min(l_tax), min(l_quantity)
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchone()
    assert lo[0] >= 0, f"l_extendedprice < 0 breaks _cents rounding: {lo[0]}"
    assert 0 <= lo[1] and lo[2] <= 1, f"l_discount outside [0,1]: {lo[1]}..{lo[2]}"
    assert lo[3] >= 0, f"l_tax < 0: {lo[3]}"
    assert lo[4] > 0, f"l_quantity <= 0 breaks price/qty _cents site: {lo[4]}"
    (p,) = con.execute(
        f"SELECT min(p_retailprice) FROM '{sf_dir}/part.parquet'"
    ).fetchone()
    assert p >= 0, f"p_retailprice < 0 breaks _cents rounding: {p}"
    (o,) = con.execute(
        f"SELECT min(o_totalprice) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()
    assert o >= 0, f"o_totalprice < 0: {o}"


def test_q22_acctbal_filter_precondition(con, sf_dir):
    """Q22 feeds c_acctbal to _cents only above the positive-balance
    average; raw balances are allowed to be (and are) negative. The
    guard is that a positive average EXISTS, which makes the filtered
    set strictly positive."""
    avg_pos, mn = con.execute(
        f"""
        SELECT (SELECT avg(c_acctbal) FROM '{sf_dir}/customer.parquet'
                WHERE c_acctbal > 0.0),
               (SELECT min(c_acctbal) FROM '{sf_dir}/customer.parquet')
        """
    ).fetchone()
    assert avg_pos is not None and avg_pos > 0
    assert mn < 0  # documents that raw balances ARE negative here

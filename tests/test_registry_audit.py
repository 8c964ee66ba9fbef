"""Registry-wide scale-killer regression gate: every lazily-built
query plan is scanned for cartesian products, order-only global
windows, and row-at-a-time Python evals (tools/audit_registry.py is
the standalone twin). A new query that reintroduces any of these
fails CI here, not the 100 TB run."""

from __future__ import annotations


def test_registry_has_no_scale_killers(spark, sf_dir, monkeypatch):
    import tools.audit_registry as audit

    monkeypatch.setattr(audit, "SF_DIR", sf_dir)
    assert audit.main() == 0


_TPCH_SUITE = {
    "Q1": "pricing_summary",
    "Q2": "sql_correlated_min_cost",
    "Q3": "sql_shipping_priority",
    "Q4": "sql_exists_late_ship",
    "Q5": "join_star_revenue",
    "Q6": "sql_forecast_revenue",
    "Q7": "sql_volume_shipping",
    "Q8": "sql_market_share",
    "Q9": "sql_product_profit",
    "Q10": "sql_returned_revenue_topk",
    "Q11": "sql_important_stock",
    "Q12": "sql_priority_line_counts",
    "Q13": "sql_customer_distribution",
    "Q14": "join_promo_share",
    "Q15": "sql_view_max_revenue",
    "Q16": "sql_supplier_relationship",
    "Q17": "sql_correlated_small_quantity",
    "Q18": "sql_large_volume_orders",
    "Q19": "sql_disjunctive_brand_revenue",
    "Q20": "sql_nested_in_bulk_suppliers",
    "Q21": "sql_sole_late_supplier",
    "Q22": "sql_not_exists_idle_customers",
}


def test_tpch_suite_complete():
    """Pin the 22/22 TPC-H shape map (MIGRATION.md): every shape has a
    registered entry, and every one is EXACT-oracle-checked (none may
    quietly degrade to rows-only)."""
    from gostream_spark import registry

    qs, oracles = registry.queries(), registry.oracle_sql()
    missing = {q: n for q, n in _TPCH_SUITE.items() if n not in qs}
    assert not missing, f"TPC-H shapes without a registered query: {missing}"
    unoracled = {q: n for q, n in _TPCH_SUITE.items() if n not in oracles}
    assert not unoracled, f"TPC-H shapes without an exact oracle: {unoracled}"

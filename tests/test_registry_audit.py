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

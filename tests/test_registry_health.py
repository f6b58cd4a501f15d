"""Registry invariants: every query oracled, docs in sync, collision
guard live — the drift checks the round-5 shadowed-name incident
showed a plain dict registry needs."""

import re

import pytest

from rsgislib_ray.pipelines import queries as qmod


def test_every_query_has_an_oracle():
    q = qmod.queries()
    o = qmod.oracle_sql()
    assert len(q) == len(o), (
        f"{len(q) - len(o)} rows-only queries crept back in: "
        f"{sorted(set(q) - set(o))}"
    )
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_registry_rejects_duplicate_names():
    any_name = next(iter(qmod.queries()))
    with pytest.raises(ValueError):
        @qmod.register(any_name, "SELECT 1")
        def _dup(sf_dir):  # pragma: no cover - must not register
            raise AssertionError


def test_coverage_appendix_in_sync():
    text = open("COVERAGE.md").read()
    m = re.search(
        r"## Appendix: full registry index.*?```(.*?)```",
        text,
        re.DOTALL,
    )
    assert m, "COVERAGE.md appendix missing"
    listed = set(m.group(1).split())
    reg = set(qmod.queries())
    assert listed == reg, (
        f"appendix stale: missing {sorted(reg - listed)[:5]}, "
        f"extra {sorted(listed - reg)[:5]} "
        "(regenerate with tools/gen_registry_index.py)"
    )


def test_coverage_count_line_in_sync():
    text = open("COVERAGE.md").read()
    m = re.search(r"All (\d+) `queries\(\)` entries", text)
    assert m and int(m.group(1)) == len(qmod.queries())

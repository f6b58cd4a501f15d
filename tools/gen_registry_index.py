"""Regenerate the COVERAGE.md registry-index appendix.

Usage: python tools/gen_registry_index.py
Prints the appendix block to stdout; paste over the existing
"## Appendix: full registry index" section after registry changes.
"""
from rsgislib_ray.pipelines.queries import queries, oracle_sql


def main() -> None:
    reg = sorted(queries())
    osql = set(oracle_sql())
    print("## Appendix: full registry index (auto-generated)\n")
    print(
        f"All {len(reg)} `queries()` entries; every one has a DuckDB "
        "`oracle_sql()` entry (zero rows-only). Generated from the "
        "registry by tools/gen_registry_index.py; the per-operator "
        "rows above give the reference citations.\n"
    )
    print("```")
    for i in range(0, len(reg), 3):
        chunk = reg[i : i + 3]
        for n in chunk:
            assert n in osql, f"{n} has no oracle"
        print("  ".join(f"{x:<38}" for x in chunk).rstrip())
    print("```")


if __name__ == "__main__":
    main()

"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline over the
sf0.001 interleaved document table; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (plus the training-data ops);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query. Ray is initialised by the driver — nothing here
calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: interleaved docs ->
    parse geom spans -> cell/tile assignment -> broadcast STRtree PIP
    join. Returns the joined Dataset (spans column untouched)."""
    from rsgislib_ray.pipelines.flagship import (
        docs_from_documents_table,
        flagship,
    )

    docs = docs_from_documents_table("/root/testdata/sf0.001")
    return flagship(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    from rsgislib_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from rsgislib_ray.pipelines.queries import oracle_sql as _o

    return _o()

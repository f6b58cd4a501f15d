"""Arrow-block adapter for pandas ``map_groups`` functions.

``pa.Table.from_pandas`` attaches ``pandas`` schema metadata whose
hash raises (``unhashable type: 'dict'``), which defeats Ray Data's
schema deduplication — every downstream union/reduce logs a benign
but noisy "Failed to hash the schemas" warning and re-unifies
schemas it could have deduped. Wrapping a group fn with
:func:`arrowize` (or passing a from_pandas table through
:func:`clean`) converts to Arrow once, at source, with the metadata
stripped, so every block schema in the pipeline is hashable.
"""

from __future__ import annotations

import pyarrow as pa


def clean(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def arrowize(fn):
    def wrapped(g):
        out = fn(g)
        if isinstance(out, pa.Table):
            return clean(out)
        return clean(pa.Table.from_pandas(out, preserve_index=False))

    return wrapped

"""Scalar formatting helpers from the media connector.

Ports of ``/root/reference/src/ingestion/connectors/media/models.py``:

  * ``format_timestamp`` (:24-31): seconds → ``H:MM:SS`` when the hour
    part is non-zero else ``M:SS`` (int-truncated seconds).
  * ``segment_id`` (:19-21): ``{doc_id}#t={start_s:.3f}`` — the stable id
    of a transcript segment inside a media document.

Pure Column expressions (``format_string`` is codegen'd printf), with the
same %-format semantics DuckDB's ``printf`` offers, so both are
oracle-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_timestamp(seconds: Column) -> Column:
    """models.py:24-31: HH:MM:SS when hours > 0, else MM:SS."""
    total = F.floor(seconds).cast("long")
    h = (total / 3600).cast("long")
    rem = total % 3600
    m = (rem / 60).cast("long")
    s = total % 60
    return F.when(
        h > 0, F.format_string("%d:%02d:%02d", h, m, s)
    ).otherwise(F.format_string("%d:%02d", m, s))


def segment_id(doc_id: Column, start_s: Column) -> Column:
    """models.py:19-21: ``{doc_id}#t={start_s:.3f}``."""
    return F.format_string("%s#t=%.3f", doc_id.cast("string"), start_s)

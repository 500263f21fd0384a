"""Document-corpus reader seam.

The north input is a Lance table of interleaved text+media documents
(`BASELINE.json` input_hint: ``doc_id: string, spans:
list<struct<kind,text,media_ref,offset>>``). Lance is unavailable in this
environment, so ``read_documents`` reads the same schema from Parquet and
keeps a format switch so ``ray.data.read_lance`` drops in unchanged on a
cluster with Lance installed.
"""

from __future__ import annotations

import ray.data

SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def read_documents(path: str, format: str = "parquet", **kwargs):
    """Read an interleaved-document corpus as a ``ray.data.Dataset``.

    ``columns=['doc_id', 'spans']`` pruning is applied by default — pass
    ``columns=None`` to read everything.
    """
    if format == "lance":
        return ray.data.read_lance(path, **kwargs)  # pragma: no cover
    kwargs.setdefault("columns", ["doc_id", "spans"])
    if kwargs["columns"] is None:
        kwargs.pop("columns")
    return ray.data.read_parquet(path, **kwargs)

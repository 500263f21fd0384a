"""Drop-in convenience API mirroring the reference's entry points
(`cartwright/categorize.py:430-474` — ``columns_classified``,
``columns_categorized``, ``categorize``) so a user of the reference can
switch with the same call shapes. Accepts a CSV path, a pandas DataFrame,
or a ``ray.data.Dataset``.

Local inputs run the single-block path (no Ray session needed); a Dataset
runs the distributed sampling path. Nothing here calls ``ray.init``.
"""

from __future__ import annotations

import pyarrow as pa

from .detectors import cascade
from .detectors.schemas import Classifications


def _to_input(df=None, path=None, ds=None):
    if ds is not None:
        return ("ds", ds)
    if df is not None:
        return ("table", pa.Table.from_pandas(df))
    if path is not None:
        import pandas as pd
        return ("table", pa.Table.from_pandas(pd.read_csv(path,
                                                          encoding="latin-1")))
    raise ValueError("pass one of df=, path=, ds=")


def columns_classified(*, df=None, path=None, ds=None,
                       number_of_samples: int = 100,
                       seconds_to_finish: float | None = None) -> Classifications:
    """Reference ``CartwrightClassify.columns_classified`` equivalent.

    ``seconds_to_finish`` mirrors the reference's wall-clock budget
    (columns past the budget → category 'timeout'); None (default)
    disables it — the cascade is bounded anyway."""
    kind, obj = _to_input(df, path, ds)
    if kind == "table":
        return cascade.classify_table(obj, num_samples=number_of_samples,
                                      seconds_to_finish=seconds_to_finish)
    return cascade.classify_dataset(obj, num_samples=number_of_samples)


def columns_categorized(*, df=None, path=None, ds=None,
                        number_of_samples: int = 100) -> dict:
    """Reference ``columns_categorized`` (`categorize.py:445-463`):
    {column: {category, subcategory, format, time_resolution, ...}}."""
    cls = columns_classified(df=df, path=path, ds=ds,
                             number_of_samples=number_of_samples)
    return cascade.columns_categorized(cls)


def categorize(*, df=None, path=None, ds=None,
               number_of_samples: int = 100) -> dict:
    """Reference ``categorize`` (`categorize.py:465-474`): classified
    columns only."""
    cls = columns_classified(df=df, path=path, ds=ds,
                             number_of_samples=number_of_samples)
    return cascade.categorize(cls)

"""Arrow-vectorized pandas UDFs (OP-44 surface).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves signatures from live type hints, and the future
import would turn them into unresolvable strings.

Kernels are self-contained (numpy/pandas only, no references to this
package's module globals) so cloudpickle serializes them by value and
workers need no import path to this package.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def to_cents_udf():
    """bigint pandas_udf: floor(balance * 100) — integer-exact so a SQL
    oracle matches bit-for-bit. Stands in for any residual row logic the
    built-in functions can't express (SURVEY.md §2.8 OP-44)."""

    @pandas_udf("bigint")
    def to_cents(bal: pd.Series) -> pd.Series:
        import numpy as np

        return np.floor(bal * 100).astype("int64")

    return to_cents

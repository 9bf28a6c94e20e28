"""Arrow-vectorized pandas_udf kernels (scalar + grouped-agg tiers).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the Series/scalar signature from the *evaluated* type hints,
and PEP-563 stringified hints break that inference.

These exist to exercise the API tiers (see
``queries_ext.pandas_udf_midrange_by_type``); every production text /
vector op in this engine stays Catalyst-side.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cap250(v: pd.Series) -> pd.Series:
    """SCALAR tier: Series→Series batch cap at 250.0."""
    return v.clip(upper=250.0)


@pandas_udf("double")
def midrange(v: pd.Series) -> float:
    """GROUPED_AGG (UDAF) tier: order-insensitive (min+max)/2."""
    return float((v.min() + v.max()) / 2.0)

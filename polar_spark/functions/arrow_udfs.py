"""Vectorized (Arrow) UDFs for the few identities built-ins can't express.

Only UUIDv5 today: the reference derives a GitLab instance id as
``uuid5(NAMESPACE_URL, base_url)``
(/root/reference/src/agents/gitlab/observe/src/lib.rs:239-241) — kept
byte-exact for parity rather than substituting a sha1 surrogate.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def uuid5_url(base_url: pd.Series) -> pd.Series:
    """UUIDv5 over the URL namespace — instance identity parity."""
    ns = uuid.NAMESPACE_URL
    return base_url.map(lambda u: str(uuid.uuid5(ns, u)) if u is not None else None)

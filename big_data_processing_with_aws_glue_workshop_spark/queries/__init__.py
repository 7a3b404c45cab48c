"""Driver-facing query registry.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent ANSI SQL for the DuckDB oracle
(the driver pre-registers the parquet tables as views).

Every query here is the Spark-first re-expression of an operator family from
SURVEY.md §2 (file:line citations in each docstring). Queries whose semantics
are not SQL-expressible (approximate/LSH ops) appear in QUERIES only.
"""

import functools

from ._tables import ensure_session_confs
from .relational import QUERIES as _REL_QUERIES, ORACLES as _REL_ORACLES
from .events import QUERIES as _EV_QUERIES, ORACLES as _EV_ORACLES
from .textops import QUERIES as _TX_QUERIES, ORACLES as _TX_ORACLES
from .vectors import QUERIES as _VC_QUERIES, ORACLES as _VC_ORACLES
from .media import QUERIES as _MD_QUERIES, ORACLES as _MD_ORACLES


def _self_sufficient(fn):
    """Pin required session confs before the query builds its plan.

    The driver supplies a vanilla session (ANSI on, no nanosAsLong); every
    registered callable must work there without our session factory.
    """

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


QUERIES = {
    name: _self_sufficient(fn)
    for name, fn in {
        **_REL_QUERIES,
        **_EV_QUERIES,
        **_TX_QUERIES,
        **_VC_QUERIES,
        **_MD_QUERIES,
    }.items()
}
ORACLES = {**_REL_ORACLES, **_EV_ORACLES, **_TX_ORACLES, **_VC_ORACLES, **_MD_ORACLES}

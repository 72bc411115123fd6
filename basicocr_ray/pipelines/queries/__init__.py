"""Driver-contract queries: one Ray Data pipeline per operator from
SURVEY.md §2 plus the LLM-data-pipeline brief, each with (where
SQL-expressible) a DuckDB oracle twin in `ORACLE_SQL`.  Split into
per-domain modules (round-4); every entry is traceable to SURVEY §2
or the LLM-data brief - the algorithm-puzzle block was removed.
"""

from __future__ import annotations

from . import relational as _relational
from . import events as _events
from . import text as _text
from . import extract as _extract
from . import dedup as _dedup
from . import embed as _embed
from . import multimodal as _multimodal
from . import web as _web
from . import sketches as _sketches
from . import sampling as _sampling
from . import lm as _lm
from . import dataops as _dataops
from . import curation as _curation

from ._shared import _p  # noqa: F401
from ._shared import _read  # noqa: F401
from ._shared import _round_half_up  # noqa: F401
from ._shared import _round_col  # noqa: F401
from .relational import *  # noqa: F401,F403
from .events import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .extract import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .embed import *  # noqa: F401,F403
from .multimodal import *  # noqa: F401,F403
from .web import *  # noqa: F401,F403
from .sketches import *  # noqa: F401,F403
from .sampling import *  # noqa: F401,F403
from .lm import *  # noqa: F401,F403
from .dataops import *  # noqa: F401,F403
from .curation import *  # noqa: F401,F403

QUERIES = {}
ORACLE_SQL = {}
for _m in (_relational, _events, _text, _extract, _dedup, _embed, _multimodal, _web, _sketches, _sampling, _lm, _dataops, _curation):
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(_m.ORACLE_SQL)
del _m

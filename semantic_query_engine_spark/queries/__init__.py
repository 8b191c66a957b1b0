"""Import all query modules so their @register calls populate REGISTRY."""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

from . import advanced_q  # noqa: F401,E402
from . import dedup_q  # noqa: F401,E402
from . import curation_q  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import mlpipeline_q  # noqa: F401,E402
from . import pandas_q  # noqa: F401,E402
from . import pipeline_q  # noqa: F401,E402
from . import stats_q  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import scale_q  # noqa: F401,E402
from . import scalars  # noqa: F401,E402
from . import search_q  # noqa: F401,E402
from . import sketch_q  # noqa: F401,E402
from . import textmining_q  # noqa: F401,E402
from . import graph_q  # noqa: F401,E402
from . import encoding_q  # noqa: F401,E402
from . import ingest_q  # noqa: F401,E402
from . import multimodal_q  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import tenant  # noqa: F401,E402
from . import semantic  # noqa: F401,E402
from . import textops  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "register"]

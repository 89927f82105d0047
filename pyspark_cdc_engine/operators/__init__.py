"""Batch operator library backing ``__spark_entry__.queries()``.

Each module registers named queries into :mod:`.registry`; importing this package
loads them all.
"""

from pyspark_cdc_engine.operators.registry import REGISTRY, Query, load_table  # noqa: F401
from pyspark_cdc_engine.operators import core  # noqa: F401,E402
from pyspark_cdc_engine.operators import cdc_like  # noqa: F401,E402
from pyspark_cdc_engine.operators import text  # noqa: F401,E402
from pyspark_cdc_engine.operators import vectors  # noqa: F401,E402
from pyspark_cdc_engine.operators import dedup_scale  # noqa: F401,E402
from pyspark_cdc_engine.operators import dedup_incremental  # noqa: F401,E402
from pyspark_cdc_engine.operators import ann_incremental  # noqa: F401,E402
from pyspark_cdc_engine.operators import multimodal  # noqa: F401,E402
from pyspark_cdc_engine.operators import analytics2  # noqa: F401,E402
from pyspark_cdc_engine.operators import curation  # noqa: F401,E402
from pyspark_cdc_engine.operators import graph_sketch  # noqa: F401,E402
